package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.RecallEval
import graft.queries.IndexQueries

/** Standalone recall/QPS bench main following the reference's protocol
  * (BASELINE.md): nprobe sweep {1,2,4,8,16,32,64}, k=100, recall@1/10/100,
  * ms/query + QPS per setting. Prints one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallBench"
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val idx = IndexQueries.index(spark, sfDir)
    val buildS = (System.nanoTime() - t0) / 1e9
    val queries = RecallEval.perturbedQueries(
      Tables.embeddings(spark, sfDir)
        .where(col("vec_id") < 100).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)),
      scale = 0.5f)

    val minMs = sys.env.getOrElse("SPARK_GRAFT_MIN_TEST_MS", "3000").toDouble
    val settings = RecallEval.sweep(spark, idx, queries, k = 100,
      nProbes = Seq(1, 2, 4, 8, 16, 32, 64), ranks = Seq(1, 10, 100),
      minDurationMs = minMs)
    val js = settings.map { s =>
      f"""{"n_probe":${s.nProbe},"recall_1":${s.recalls(1)}%.4f,"recall_10":${s.recalls(10)}%.4f,"recall_100":${s.recalls(100)}%.4f,"ms_per_query":${s.msPerQuery}%.2f,"qps":${1000.0 / s.msPerQuery}%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"recall_sweep","build_s":$buildS,"k":100,"nq":${queries.length},"settings":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}
