package graft

import graft.sources.VectorFormats

/** Cross-compat probe: read a numpy-written .npy file. */
object DebugNpy {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = VectorFormats.readNpy(spark, "/tmp/numpy_written.npy", 3)
      .orderBy("vec_id").collect()
    println(s"DBG rows=${rows.length}")
    rows.take(2).foreach(r =>
      println(s"DBG ${r.getLong(0)} -> ${r.getSeq[Float](1)}"))
    spark.stop()
  }
}
