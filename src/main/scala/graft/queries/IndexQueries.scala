package graft.queries

/** IVF index build/search operators — filled in incrementally. */
object IndexQueries {
  def defs: Map[String, QueryDef] = Map()
}
