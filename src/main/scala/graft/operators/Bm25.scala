package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a build-once inverted index — the public,
  * parameterized form of the engine's lexical-retrieval path (the
  * catalog queries `bm25_top_docs` / `hybrid_rrf_top_docs` are thin
  * slice-contract wrappers over this operator).
  *
  * Lucene-shape BM25: idf = ln(1 + (N−df+0.5)/(df+0.5)), per-term score
  * idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)). N and avgdl are
  * derived from docs with ≥1 term — the only docs an inverted index
  * ever sees.
  *
  * Scale shape: [[build]] is the ONE corpus tokenization pass — the
  * posting table is written term-clustered so a SELECTIVE query
  * batch's term set, pushed as chunked `isin` predicates
  * ([[Pushdown]]), turns the posting read into parquet row-group seeks
  * (the inverted-index seek); a DENSE batch (term set above
  * [[SeekSelectivityCeiling]] of the vocabulary) matches ~every row
  * group, so scoring serves from the plain posting scan + broadcast
  * pair join instead — the measured-faster plan in that regime. df and
  * the 1-row (N, avgdl) stats are index artifacts (Lucene keeps
  * docFreq in the term dictionary and norms at index time), read back
  * vocabulary-sized and broadcast. The only corpus-sized shuffle at
  * query time is the (query_id, doc_id) partial aggregation over
  * MATCHED postings.
  */
object Bm25 {

  /** Batch-term-set-to-vocabulary ratio above which scoring skips the
    * isin seek and reads the plain posting scan. The seek wins only
    * while most row groups contain NO batch term. DebugBm25Scale swept
    * the crossover on a 20M-posting / 20k-vocab index (seek vs full
    * scan): 2.6× faster at 2% coverage, 1.9× at 4–8%, parity at ~15%,
    * 1.9× SLOWER at 28%. 0.10 sits comfortably inside the measured win
    * region with margin for different row-group shapes; real retrieval
    * batches against real vocabularies (100k+) are orders of magnitude
    * below it, while analytics-style dense scoring flips to the scan
    * plan.
    */
  val SeekSelectivityCeiling = 0.10

  // keyed by df-table PATH with the file fingerprint in the VALUE: a
  // fingerprint-keyed map grew one entry per index rebuild for the life
  // of the JVM (a streaming-append driver rebuilds per batch — r15
  // review); replace-on-mismatch bounds it at one entry per index path
  private val vocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, java.lang.Long)]()

  /** Vocabulary size (df-table row count — parquet metadata only, no
    * data read), cached per (df dir, file fingerprint) so index
    * rebuilds at the same base invalidate the entry.
    */
  private def vocabSize(spark: SparkSession, index: Index): Long = {
    // per-file name:length:nanos-mtime, the Tables.dataKey convention —
    // a null/empty listing (non-local filesystem, or a path the local
    // File API can't see) maps to None, NOT to a stable degenerate key
    // that would cache the count past an in-place rebuild
    val key = try {
      Option(new java.io.File(index.dfPath).listFiles())
        .filter(_.nonEmpty)
        .map(_.sortBy(_.getName).map { f =>
          val mt = java.nio.file.Files.getLastModifiedTime(f.toPath)
            .to(java.util.concurrent.TimeUnit.NANOSECONDS)
          s"${f.getName}:${f.length}:$mt"
        }.mkString(s"${index.dfPath}@", ",", ""))
    } catch { case _: Throwable => None }
    key match {
      case Some(fp) =>
        val cached = vocabCache.get(index.dfPath)
        if (cached != null && cached._1 == fp) cached._2
        else {
          val n: java.lang.Long = spark.read.parquet(index.dfPath).count()
          vocabCache.put(index.dfPath, (fp, n))
          n
        }
      // fingerprint unavailable: a bare path key could outlive an
      // in-place rebuild and flip the seek-vs-scan rule on stale
      // data — recount (metadata-only, cheap) instead of caching
      case None => spark.read.parquet(index.dfPath).count()
    }
  }

  /** Handle to a built index: posting table, term dictionary (df), and
    * 1-row corpus stats, all parquet under `base`.
    */
  final case class Index(base: String) {
    def tfPath: String = s"$base/bm25_tf"
    def dfPath: String = s"$base/bm25_df"
    def statsPath: String = s"$base/bm25_stats"
  }

  /** Build the inverted index from a (doc_id: long, terms:
    * array<string>) corpus — tokenization is the caller's contract (it
    * decides casing/splitting), the build owns everything after it.
    *
    * The posting write range-partitions on (term, doc_id), NOT term
    * alone: a hot term ("the"-grade stopwords at corpus scale) would
    * otherwise concentrate its entire corpus-wide posting list in one
    * range partition — a straggler writer task. With doc_id in the
    * range key a hot term's postings span as many partitions as its
    * volume demands, while each partition still covers a contiguous
    * (term, doc_id) interval, so `sortWithinPartitions(term, doc_id)`
    * keeps every row group's term min/max tight and the query-time
    * row-group skip behavior is unchanged.
    */
  def build(corpus: DataFrame, base: String): Index = {
    val spark = corpus.sparkSession
    val idx = Index(base)
    // dl is functionally dependent on doc_id — grouping by it is free
    // and saves a doc-length join at scoring time
    corpus
      .select(col("doc_id"), size(col("terms")).as("dl"),
        explode(col("terms")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("term"), col("doc_id"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(idx.tfPath)
    val tf = spark.read.parquet(idx.tfPath)
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(idx.dfPath)
    tf.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .write.mode("overwrite").parquet(idx.statsPath)
    idx
  }

  /** Scored (query_id, doc_id, score) from already-collected DISTINCT
    * (query_id, term) pairs — the form for callers that amortize the
    * query-side tokenization (one collect per query batch, reused
    * across scoring calls). Per-term scores fold in sorted order and
    * round(4) BEFORE any ranking (the repo-wide cross-engine float
    * determinism contract).
    */
  def scoredFromPairs(spark: SparkSession, index: Index,
      queryPairs: Array[(Long, String)],
      k1: Double = 1.2, b: Double = 0.75,
      seekCeiling: Double = SeekSelectivityCeiling): DataFrame = {
    import spark.implicits._
    // the row-group seek depends on the isin set reaching the parquet
    // scan as an IN pushdown; past the in-filter threshold Spark
    // rewrites it to a min/max RANGE filter on the sorted term column —
    // still a predicate, but one whose [min(term), max(term)] interval
    // spans nearly the whole term-clustered file for any realistic
    // batch, so row-group skipping degrades to a full index scan. So:
    // chunk the SORTED distinct term set into ≤ threshold groups and
    // union the per-chunk pruned scans — every scan keeps a true IN
    // pushdown (tight per-chunk row-group seeks over a contiguous term
    // interval, since terms are sorted before chunking) for ANY query
    // batch size, at the cost of one scan node per chunk.
    // null terms are dropped: an equi-join on a null term matches no
    // posting anyway (SQL null semantics), and leaving them in NPEd
    // the driver-side sort below — the corpus build tolerates the same
    // degraded rows, so the query side must too (r15 review)
    val qtermSorted =
      queryPairs.map(_._2).filter(_ != null).distinct.sorted.toSeq
    // chunk bound = min(session in-filter threshold, the global
    // Or-tree depth cap): past the threshold Spark degrades IN to a
    // range filter (no seek), and past ~5.9k literals the pushed
    // left-deep Or tree overflows the executor stack fatally — see
    // [[Pushdown]], which owns both bounds
    val pushLimit = Pushdown.sessionChunk(spark)
    // seek-vs-scan: the isin seek only pays when the batch's term set
    // is SELECTIVE relative to the vocabulary — a dense batch matches
    // something in ~every row group, so the pushed set skips nothing
    // and the chunked scans are pure overhead (measured at 20M
    // postings: 28%-of-vocab batch reads 1.7× SLOWER chunked than a
    // full scan + broadcast join; DebugBm25Scale, SCALE.md round 8).
    // Vocabulary size = one cached metadata-only count of the df table.
    val seek = qtermSorted.size <= math.max(1L,
      (vocabSize(spark, index) * seekCeiling).toLong)
    def prunedScan(path: String): DataFrame =
      if (!seek) spark.read.parquet(path)
      else Pushdown.inChunks(qtermSorted, pushLimit)(
        c => spark.read.parquet(path).where(col("term").isin(c: _*)))
    val qterms = queryPairs.toSeq.toDF("query_id", "term")
    val stats = spark.read.parquet(index.statsPath)
    // the chunked term set is carried as isin PREDICATES on both the
    // posting and df scans — semantically redundant with the join, but
    // it is what pushes into the scans (row-group skip); the join
    // itself is against the broadcast driver-sized pair table
    // the per-(term, doc) score is query-independent — computed BEFORE
    // the qterms join, so each matched posting evaluates the log/idf
    // arithmetic once instead of once per query containing the term
    // (a dense batch joins every posting against up to |queries| rows;
    // r18 measurement: the post-join form re-ran the scoring math on
    // the multiplied rows). Join order change only — the same rows
    // reach the aggregate with bitwise-identical s.
    prunedScan(index.tfPath)
      .join(broadcast(prunedScan(index.dfPath)), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1)
            * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select(col("term"), col("doc_id"), col("s"))
      .join(broadcast(qterms), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(aggregate(sort_array(collect_list(col("s"))), lit(0.0),
        (a, x) => a + x), 4).as("score"))
  }

  /** Scored (query_id, doc_id, score) for a (query_id: long, terms:
    * array<string>) query batch. The query side is driver-sized by
    * contract (a query batch, not a corpus) — its distinct (query_id,
    * term) pairs are collected once and broadcast.
    */
  def scored(spark: SparkSession, index: Index, queries: DataFrame,
      k1: Double = 1.2, b: Double = 0.75,
      seekCeiling: Double = SeekSelectivityCeiling): DataFrame =
    scoredFromPairs(spark, index,
      queries.select(col("query_id"),
          explode(array_distinct(col("terms"))).as("term"))
        .collect().map(r => (r.getLong(0), r.getString(1))),
      k1, b, seekCeiling)

  /** Top-k docs per query: (query_id, rank, doc_id, score), rank 1..k,
    * score DESC, ties by doc_id — via the bounded-state [[TopNByKey]]
    * aggregate (≤k rows per query per map task).
    */
  def topDocs(scoredDf: DataFrame, k: Int): DataFrame =
    TopNByKey.topN(scoredDf, Seq("query_id"), col("score"), col("doc_id"),
        n = k, asc = false)
      .select(col("query_id"), col("rk").cast("long").as("rank"),
        col("id").as("doc_id"), col("ord").as("score"))
      .orderBy(col("query_id"), col("rank"))
}
