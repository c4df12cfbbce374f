package graft

object DebugCount {
  def main(args: Array[String]): Unit = {
    println(s"COUNT queries=${graft.queries.Catalog.all.size} " +
      s"oracle=${graft.queries.Catalog.oracleSql.size} " +
      s"benched=${graft.queries.Catalog.all.count(_._2.bench)}")
  }
}
