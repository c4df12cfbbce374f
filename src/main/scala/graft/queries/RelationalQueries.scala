package graft.queries

/** TPC-H-style relational operators — filled in incrementally. */
object RelationalQueries {
  def defs: Map[String, QueryDef] = Map()
}
