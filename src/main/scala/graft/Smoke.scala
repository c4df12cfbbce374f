package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 check: SparkEntry.entry
  * must return >0 rows on sf0.001. Prints the rows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "10000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    df.printSchema()
    rows.foreach(r => println(r.mkString("\t")))
    println(s"entry rows=${rows.length}")
    spark.stop()
  }
}
