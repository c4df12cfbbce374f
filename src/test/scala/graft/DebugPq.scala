package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Pq}

/** Sweep PQ configs: reconstruction MSE ratio + recall@10 vs exact. */
object DebugPq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(col("embedding")).head().getSeq[Float](0).length
    val query = emb.where(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exact = graft.queries.VectorQueries.knnExact(spark, dir, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    for ((m, ksub) <- Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (32, 16))) {
      val model = Pq.train(emb, "embedding", dim, m, ksub,
        iters = 15, orderCol = Some("vec_id"))
      val enc = Pq.encode(emb, "embedding", model).persist()
      val rows = enc.select(col("embedding"), col("pq_code")).collect()
      val (ms, ns) = rows.foldLeft((0.0, 0.0)) { case ((a, b), r) =>
        val v = r.getSeq[Float](0).toArray
        val rec = Pq.decode(r.getSeq[Byte](1).toArray, model)
        (a + KMeans.sqDist(v, rec), b + KMeans.sqDist(v, new Array[Float](dim)))
      }
      val got = Pq.search(enc, "vec_id", "pq_code", model, query, 10)
        .select("vec_id").as[Long].collect().toSet
      println(f"PQCFG m=$m%2d ksub=$ksub%3d bytes=${m} mseRatio=${ms / ns}%.3f recall10=${(got & exact).size / 10.0}%.1f")
      enc.unpersist()
    }
    spark.stop()
  }
}
