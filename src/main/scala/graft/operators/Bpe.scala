package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — the step upstream of
  * the engine's token counting: learn the merge table itself from the
  * corpus. The expensive, data-sized part — word counting — is
  * distributed (one groupBy with map-side combine); the merge loop then
  * runs driver-side over the BOUNDED word-frequency vocabulary, exactly
  * how production tokenizer trainers work (HuggingFace/SentencePiece
  * train from a word-count table, not from raw text): at 100 TB the
  * corpus scan is the cluster's job, while the vocabulary is a few
  * million (word, count) rows capped at `maxVocab` by frequency, a
  * driver-sized model artifact like the IVF routing table or the PQ
  * codebooks.
  *
  * Determinism: counts are exact integers and every tie in the merge
  * loop breaks lexicographically, so the merge table is a pure function
  * of the corpus — partitioning-independent and engine-reproducible.
  */
object Bpe {

  /** One learned merge: `left`+`right` fused at step `rank` (0-based),
    * with the pair's corpus frequency at merge time.
    */
  final case class Merge(left: String, right: String, rank: Int, freq: Long)

  /** Distributed word counts → driver merge loop.
    *
    * @param tokensCol array<string> column (pre-tokenized words)
    * @param maxVocab  top-V words by (count desc, word asc) enter
    *                  training — caps driver memory; rare tail words
    *                  contribute negligible pair mass anyway
    */
  def train(df: DataFrame, tokensCol: String, numMerges: Int,
      maxVocab: Int = 100000): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be > 0: $numMerges")
    val wordCounts = df
      .select(explode(col(tokensCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // each vocab word as its current symbol sequence — split by CODE
    // POINT, not Char: a per-Char split would cut surrogate pairs into
    // lone-surrogate symbols that Spark's UTF8String encoding mangles
    // into replacement bytes, corrupting the merge table for any
    // non-BMP text (emoji, CJK extensions)
    var vocab: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (codePointSyms(w), c) }

    // pair counts maintained INCREMENTALLY: built once, then each step
    // delta-updates only the words the chosen merge rewrites (whole-word
    // subtract/re-add, exact under any overlap pattern) — the full
    // per-step recount rebuilt the map over every pair of every word,
    // the dominant cost of the loop. The per-step candidate scan is
    // still O(total symbols) equality checks; a pair→words index (the
    // HF/SentencePiece trainer structure) is the next step if training
    // vocabularies ever grow past maxVocab.
    val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
    def delta(syms: Array[String], c: Long): Unit = {
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val next = pairFreq.getOrElse(p, 0L) + c
        if (next == 0L) pairFreq.remove(p) else pairFreq(p) = next
        i += 1
      }
    }
    vocab.foreach { case (syms, c) => delta(syms, c) }

    val merges = Vector.newBuilder[Merge]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      if (pairFreq.isEmpty) done = true // every word fully merged
      else {
        val ((l, r), f) = pairFreq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += Merge(l, r, step, f)
        val fused = l + r
        vocab = vocab.map { case (syms, c) =>
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            has = syms(i) == l && syms(i + 1) == r
            i += 1
          }
          if (!has) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += fused; j += 2
              } else { out += syms(j); j += 1 }
            }
            val merged = out.result()
            delta(syms, -c)
            delta(merged, c)
            (merged, c)
          }
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Merge table → pair-rank lookup, built ONCE and broadcast/shared by
    * encode callers (a per-row toMap in a UDF would rebuild it per
    * token).
    */
  def rankMap(merges: Seq[Merge]): Map[(String, String), Int] =
    merges.map(m => (m.left, m.right) -> m.rank).toMap

  /** Apply a merge table to one word (greedy lowest-rank-first, the BPE
    * inference rule). Driver/UDF-sized helper for tests and scoring.
    */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    encodeWordRanked(word, rankMap(merges))

  def encodeWordRanked(word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms = codePointSyms(word).toVector
    var continue = syms.length > 1
    while (continue) {
      // minOption, not a full sort for its head — this runs per merge
      // iteration of every encoded word in the UDF hot path
      val best = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        .minOption
      best match {
        case Some((_, i)) =>
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
          continue = syms.length > 1
        case None => continue = false
      }
    }
    syms
  }

  /** One symbol per Unicode code point (surrogate pairs stay whole). */
  private def codePointSyms(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Catalog form: the learned merge table as rows. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.freq))
      .toDF("rank", "left_sym", "right_sym", "freq")
  }
}
