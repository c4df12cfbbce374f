package graft

import graft.queries.Catalog

/** Time individual catalog queries: DebugTime <sfDir> <query>... */
object DebugTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.tail) {
      val t0 = System.nanoTime()
      val n = Catalog.all(name).build(spark, dir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $name rows=$n $sec%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
