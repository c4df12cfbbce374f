package graft

import graft.queries.{Catalog, IndexQueries, RelationalQueries, VectorQueries}

object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      Catalog.all(name).build(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
