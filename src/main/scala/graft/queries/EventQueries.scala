package graft.queries

/** JSON + time-window operators over events.parquet — filled in incrementally. */
object EventQueries {
  def defs: Map[String, QueryDef] = Map()
}
