package graft.queries

/** Text-analysis operators over documents.parquet — filled in incrementally. */
object TextQueries {
  def defs: Map[String, QueryDef] = Map()
}
