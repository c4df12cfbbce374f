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

  /** Components over an undirected edge list. Returns
    * `(id: long, cluster_id: long)` — `cluster_id` is the component's
    * minimum vertex id (only vertices that appear in an edge are
    * returned; isolated vertices are their own trivial clusters and
    * callers can add them back with a union if needed).
    */
  def run(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges
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
    labels
  }
}
