package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, KMeans}

/** Phase timing of Ivf.build at a given sf dir. */
object DebugIvfBuild {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = Tables.embeddings(spark, dir)
    val n = t("count") { df.count() }
    val k = KMeans.numClusters(n)
    val iters = KMeans.maxIterations(n)
    println(s"n=$n k=$k iters=$iters")
    val pool = t("pool collect") {
      df.select(col("vec_id"), col("embedding"))
        .orderBy(xxhash64(col("vec_id"), lit(42L)), col("vec_id"))
        .limit(KMeans.InitSampleCap)
        .collect().map(_.getSeq[Float](1).toArray)
    }
    val model = t("trainDriver") { KMeans.trainDriver(pool, k, iters, 42L) }
    val assigned = t("assign+persist+count") {
      val a = KMeans.withAssignment(df, "embedding", model, 42L, "raw_centroid_id").persist()
      a.count(); a
    }
    t("full build end-to-end") {
      Ivf.build(Tables.embeddings(spark, dir), "vec_id", "embedding",
        "/tmp/graft_dbg_index")
    }
    spark.stop()
  }
}
