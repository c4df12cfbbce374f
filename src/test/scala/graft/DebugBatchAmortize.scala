package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf
import graft.queries.IndexQueries

/** Measure: batch ANN (one pruned scan) vs per-query sequential search. */
object DebugBatchAmortize {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val idx = IndexQueries.index(spark, dir)
    val qs = Tables.embeddings(spark, dir)
      .where(col("vec_id") < 32).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // warm-up
    Ivf.searchBatch(spark, idx, qs.take(2), 10, 20).collect()
    var t0 = System.nanoTime()
    Ivf.searchBatch(spark, idx, qs, 10, 20).collect()
    val tBatch = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    qs.foreach { case (_, q) => Ivf.search(spark, idx, q, 10, 20).collect() }
    val tLoop = (System.nanoTime() - t0) / 1e9
    println(f"DBG nq=${qs.length} batch=${tBatch}%.2fs loop=${tLoop}%.2fs speedup=${tLoop / tBatch}%.1fx")
    spark.stop()
  }
}
