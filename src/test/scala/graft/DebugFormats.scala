package graft

import java.nio.file.Files
import graft.sources.VectorFormats

/** Sample user program: generate → fvecs roundtrip → index → search. */
object DebugFormats {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gen = VectorFormats.generate(spark, 500, 32, 123L)
    println("DBG generated: " + gen.count() + " rows, first=" +
      gen.orderBy("vec_id").head().getSeq[Float](1).take(4))
    val p = Files.createTempDirectory("fmt").resolve("v.fvecs").toString
    VectorFormats.writeFvecs(
      gen.orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray).iterator, p)
    val back = VectorFormats.readFvecs(spark, p, 6)
    println("DBG fvecs roundtrip rows: " + back.count())
    val dir = Files.createTempDirectory("fmt_idx").toString
    val idx = graft.operators.Ivf.build(back, "vec_id", "embedding", dir)
    val q = back.where("vec_id = 9").select("embedding").head().getSeq[Float](0).toArray
    println("DBG search top-3: " + graft.operators.Ivf
      .search(spark, idx, q, 3, 10000).collect().mkString(" | "))
    spark.stop()
  }
}
