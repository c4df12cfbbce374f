package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the step a
  * dedup pipeline runs after near-dup pair generation (MinHash/SimHash)
  * to turn pairwise matches into "keep one document per cluster" sets.
  *
  * Each round every vertex takes the minimum label over itself and its
  * neighbors; convergence needs `diameter` rounds. Near-dup clusters are
  * small and dense (a group of copies of one document), so the diameter —
  * and the round count — is tiny in practice; for adversarial
  * long-chain graphs at 100 TB the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond") converges in O(log²) rounds with the same per-round shape
  * (join + groupBy-min), so the plumbing here carries over.
  *
  * Per round: one join (edges × labels, both hash-partitioned on the
  * join key) + one groupBy-min, then `localCheckpoint` to truncate the
  * lineage — iterative plans otherwise grow exponentially in the
  * optimizer. On a real cluster use `checkpoint` with a reliable
  * checkpoint dir instead (survives executor loss).
  */
object ConnectedComponents {

  /** Components over an undirected edge list — size-adaptive dispatch.
    * A verified near-dup pair graph is a small fraction of the corpus;
    * below `localEdgeCap` edges (default 4M ≈ 64 MB of longs) driver
    * union-find finishes in milliseconds where distributed label
    * propagation pays seconds of per-round job overhead. Above the cap
    * — the genuine 100 TB case — it dispatches to the distributed
    * propagation in `run`. Both return `(id: long, cluster_id: long)`.
    */
  def resolve(edges: DataFrame, aCol: String, bCol: String,
      localEdgeCap: Long = 1L << 22): DataFrame = {
    val e = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .persist()
    val out = if (e.count() <= localEdgeCap) runLocal(e) else run(e, "src", "dst")
    e.unpersist(blocking = false)
    out
  }

  /** Driver union-find (path halving + union by min). */
  private def runLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x))
        x = parent(x)
      }
      x
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
        parent(hi) = lo
      }
    }
    parent.keys.toSeq.map(v => (v, find(v))).toDF("id", "cluster_id")
  }

  /** Distributed min-label propagation (the >localEdgeCap path). The
    * input is persisted before symmetrizing so an expensive upstream
    * pipeline is not evaluated once per union branch.
    */
  def run(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val e = edges.persist()
    val sym = e
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(e
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = sym
        .join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("cluster_id"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      // labels only ever decrease, so "no row changed" is the fixpoint;
      // both sides are hash-partitioned on id — the check is shuffle-free
      converged = next.as("n").join(labels.as("o"), "id")
        .where(col("n.cluster_id") =!= col("o.cluster_id"))
        .isEmpty
      labels = next
      iter += 1
    }
    sym.unpersist()
    e.unpersist(blocking = false)
    labels
  }
}
