package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-encoder re-ranking over a bounded candidate list — the final
  * stage of the production retrieval stack (retrieve with cheap arms,
  * re-rank the short list with an expensive pairwise model, e.g.
  * monoBERT / MiniLM cross-encoders), parameterized over caller tables
  * (the catalog query `rerank_cross_top_docs` is a thin wrapper).
  *
  * The pairwise kernel is a STUB in the repo's encoder convention — a
  * real interaction signal (distinct-term overlap ratio, the relevance
  * part) plus an md5-derived epsilon ≤ 1e-3 standing in for the
  * learned component — so the Spark-side plumbing is real and
  * oracle-checkable end to end; a real model replaces exactly the
  * `ce_score` expression.
  *
  * Scale shape: `pairs` is driver-sized by contract (queries ×
  * candidates-per-query, the MaxSim.rerank treatment), so pair terms
  * come from an isin-PRUNED corpus scan joined against the broadcast
  * pair table — per query batch the corpus contributes only the
  * candidate docs, never a scan.
  */
object CrossEncoder {

  /** Re-rank candidate (query_id, doc_id) pairs: top-k per query by the
    * stub kernel. `qTerms` = (query_id, terms array), `dTerms` =
    * (doc_id, terms array) — tokenization is the caller's contract,
    * same as [[Bm25]]. Returns (query_id, rank, doc_id, ce_score).
    */
  def rerank(spark: SparkSession, qTerms: DataFrame, dTerms: DataFrame,
      pairs: Array[(Long, Long)], k: Int): DataFrame = {
    import spark.implicits._
    val candDocs = pairs.map(_._2).distinct.toSeq
    // the PAIR set deduped too: a duplicate (query, doc) pair would
    // score as two identical rows and consume two of the query's k
    // rank slots for the same doc, displacing a real candidate
    val pairDf = pairs.distinct.toSeq.toDF("query_id", "doc_id")
    // candidate docs are batch-scaled (queries × candidates) — chunked
    // ([[Pushdown]]) so the pushed filter tree stays shallow
    val scored = Pushdown.inChunks(spark, candDocs)(cs =>
        dTerms.where(col("doc_id").isin(cs: _*)))
      .select(col("doc_id"), array_distinct(col("terms")).as("dts"))
      .join(broadcast(pairDf), Seq("doc_id"))
      .join(broadcast(qTerms.select(col("query_id"),
        array_distinct(col("terms")).as("qts"))), Seq("query_id"))
      .withColumn("ce_score", round(
        size(array_intersect(col("qts"), col("dts"))).cast("double")
          / greatest(size(col("qts")), lit(1))
          + pmod(graft.functions.Md5Long60.col(
              concat(col("query_id").cast("string"), lit(":"),
                col("doc_id").cast("string"))), lit(1000000L))
            .cast("double") / lit(1e9), 6))
    TopNByKey.topN(scored, Seq("query_id"), col("ce_score"),
        col("doc_id"), n = k, asc = false)
      .select(col("query_id"), col("rk").cast("long").as("rank"),
        col("id").as("doc_id"), col("ord").as("ce_score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
