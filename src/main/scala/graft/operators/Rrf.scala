package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) — the
  * public, parameterized fusion stage of the hybrid retrieval stack
  * (the catalog query `hybrid_rrf_top_docs` is a thin wrapper fusing
  * its BM25 and pooled-vector arms through this operator).
  *
  * rrf(q, d) = Σ_arms 1/(k0 + rank_arm(q, d)) — rank arithmetic over
  * driver-to-modest-sized ranked lists, never a corpus operation: each
  * arm is expected to be an already-cut top-N per query. Contributions
  * are exact IEEE doubles (1/(k0+r) with integer r), folded in sorted
  * order and round(6)ed BEFORE any ranking — the repo-wide
  * cross-engine float-determinism contract, which is what lets a
  * DuckDB oracle recompute the fusion bit-for-bit.
  */
object Rrf {

  /** Fuse ranked arms: each arm carries (query_id, doc_id, rk) with
    * 1-based ranks. Returns (query_id, doc_id, rrf_score).
    */
  def fuse(arms: Seq[DataFrame], k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "Rrf.fuse: at least one ranked arm required")
    val contrib = arms
      .map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rk"))).as("c")))
      .reduce(_.unionByName(_))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round(aggregate(sort_array(collect_list(col("c"))), lit(0.0),
        (a, x) => a + x), 6).as("rrf_score"))
  }

  /** Top-k fused docs per query: (query_id, rank, doc_id, rrf_score). */
  def topDocs(fused: DataFrame, k: Int): DataFrame =
    TopNByKey.topN(fused, Seq("query_id"), col("rrf_score"),
        col("doc_id"), n = k, asc = false)
      .select(col("query_id"), col("rk").cast("long").as("rank"),
        col("id").as("doc_id"), col("ord").as("rrf_score"))
      .orderBy(col("query_id"), col("rank"))
}
