package graft

import graft.operators.{Ivf, KMeans, RecallEval}
import org.apache.spark.sql.functions.col

/** Probe-set capture vs pool size: fraction of the EXACT top-n probe
  * cells captured by the hierarchical pool as the expansion rule grows.
  */
object DebugProbePool {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = "/tmp/graft_ref_scale_100000_128"
    val idx = Ivf.load(spark, s"$dataDir/index")
    val emb = spark.read.parquet(s"$dataDir/embeddings.parquet")
    val queries = RecallEval.perturbedQueries(
      emb.where(col("vec_id") < 100).select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)), 0.5f)
    val k = idx.k
    val cents = idx.centroids
    println(s"k=$k")
    val hier = new KMeans.HierarchicalAssigner(cents, idx.seed)
    // rank meta cells per query, expand members in order; capture of
    // exact top-n cells as a function of #cells expanded
    for (n <- Seq(8, 16, 64)) {
      val exactSets = queries.map { case (_, q) =>
        cents.indices.map(i => (i, KMeans.sqDist(q, cents(i))))
          .sortBy(t => (t._2, t._1)).take(n).map(_._1).toSet
      }
      for (factor <- Seq(2, 4, 8, 16, 32)) {
        // simulate pool rule: expand until pool >= factor*n (min 3 cells)
        val caps = queries.zip(exactSets).map { case ((_, q), exact) =>
          val (probes, _) = hierTopWithPool(hier, cents, q, n, factor)
          (probes.toSet & exact).size.toDouble / n
        }
        println(f"n=$n%3d factor=$factor%3d capture=${caps.sum / caps.length}%.3f")
      }
    }
    spark.stop()
  }

  // replicate topNProbe with a configurable pool factor
  def hierTopWithPool(h: KMeans.HierarchicalAssigner,
      cents: Array[Array[Float]], p: Array[Float], n: Int,
      factor: Int): (Array[Int], Int) = {
    val meta = h.metaModelForDebug
    val members = h.membersForDebug
    val md = meta.centroids.map(c => KMeans.sqDist(p, c))
    val order = meta.centroids.indices.sortBy(i => (md(i), i))
    val pool = scala.collection.mutable.ArrayBuffer.empty[Int]
    var mi = 0
    while (mi < order.length && (mi < 3 || pool.length < factor * n)) {
      pool ++= members(order(mi)); mi += 1
    }
    val ranked = pool.toArray.map(c => (c, KMeans.sqDist(p, cents(c))))
      .sortBy(t => (t._2, t._1))
    (ranked.take(n).map(_._1), ranked.length)
  }
}
