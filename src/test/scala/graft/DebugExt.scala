package graft
object DebugExt {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("e")
    val r = spark.sql(
      "SELECT vec_id, squared_l2(embedding, embedding) AS z FROM e WHERE vec_id < 3 ORDER BY vec_id")
      .collect()
    r.foreach(x => println(s"DBG $x"))
    spark.stop()
  }
}
