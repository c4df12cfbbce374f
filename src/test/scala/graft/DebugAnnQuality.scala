package graft

/** Print the ANN quality dashboard rows. */
object DebugAnnQuality {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.IndexQueries.annQualitySummary(spark, dir)
      .collect().foreach(r => println(s"QUAL ${r.mkString(" ")}"))
    spark.stop()
  }
}
