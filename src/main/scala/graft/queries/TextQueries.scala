package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over `documents.parquet` — the LLM-data-pipeline
  * surface (token counting, quality scoring, language-ID heuristic,
  * fingerprinting). All are per-row map-side expressions + one bounded
  * aggregation; they scale linearly and keep whole-stage codegen.
  *
  * Tokenization contract shared with the DuckDB oracle: split on runs of
  * whitespace, drop empty strings.
  */
object TextQueries {

  /** Tokens of the text column as array<string>. */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Per-document stats: token count, distinct tokens, avg token length. */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        col("lang"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        round(
          aggregate(col("toks"), lit(0.0), (a, t) => a + length(t)) /
            greatest(size(col("toks")), lit(1)), 4).as("avg_token_len"),
        col("n_chars"))
      .where(col("doc_id") < 100)
      .orderBy(col("doc_id"))

  private val docStatsSql =
    """SELECT doc_id, lang,
      |  len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS n_tokens,
      |  len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> ''))) AS n_distinct_tokens,
      |  round(CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) = 0 THEN 0.0
      |      ELSE list_reduce(list_transform(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> ''),
      |        t -> CAST(length(t) AS DOUBLE)), (a, b) -> a + b) END
      |    / greatest(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')), 1), 4) AS avg_token_len,
      |  n_chars
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** Corpus rollup by language and source. */
  def langSourceStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))

  private val langSourceStatsSql =
    """SELECT lang, source, count(*) AS n_docs,
      |  round(avg(n_chars), 4) AS avg_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Global token frequency: explode + count + top-k. The one genuine
    * shuffle in this module (groupBy token); at scale the partial map-side
    * aggregation collapses each partition to its distinct tokens first.
    */
  def tokenFrequency(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)

  private val tokenFrequencySql =
    """SELECT token, count(*) AS freq
      |FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |                                t -> t <> '')) AS token
      |      FROM documents) t
      |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin

  /** Count-Min-sketched token counts for the exact top-20 tokens,
    * side-by-side with their true counts — demonstrating the
    * fixed-memory frequency path ([[graft.operators.CountMin]], depth 4
    * × width 1024) against ground truth. Every cell is an integer sum,
    * so the estimates are bit-identical across engines and
    * partitionings; the CMS guarantee (estimate ≥ exact) is asserted by
    * the oracle comparing `overestimate` too.
    */
  /** The corpus token CMS (depth 4 × width 1024), collected ONCE per
    * (data version, hash family) and served to every consumer
    * thereafter — the sketch-is-the-artifact production shape the
    * Round-9 merge gate exists for (sketch(A ⊎ B) == merge(sketches)
    * is exactly what lets a deployment maintain this artifact
    * incrementally instead of rebuilding it per query). Bounded at
    * depth·width cells by construction, so the driver copy is ≤4096
    * rows. The hash family keys the memo: an xx-family bench run and
    * the md5-oracled default can never serve each other's cells.
    */
  private val CmsDepth = 4
  private val CmsWidth = 1024
  // keyed by (dir, family) and holding (data fingerprint, artifact):
  // a regenerated data version REPLACES its entry instead of adding a
  // new forever-live one (ADVICE r12 — the old fingerprint-in-key form
  // grew without bound in a long-lived driver), so the cache is bounded
  // at #dirs × #families entries of ≤ depth·width cells each
  private val cmsSketchCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, graft.operators.CountMin.SketchArtifact)]()

  /** Test window into the memo: (dir#family key → data fingerprint) —
    * SketchSpec gates that a regenerated data version REPLACES its
    * entry instead of accumulating one per fingerprint forever.
    */
  private[graft] def cmsCacheSnapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    cmsSketchCache.asScala.map { case (k, v) => k -> v._1 }.toMap
  }

  private[graft] def corpusTokenSketch(spark: SparkSession,
      dir: String): graft.operators.CountMin.SketchArtifact = {
    val dataKey = Tables.dataKey(dir)
    cmsSketchCache.compute(
      s"$dir#${graft.functions.Hash60.family(spark)}", { (_, prev) =>
        if (prev != null && prev._1 == dataKey) prev
        else (dataKey, graft.operators.CountMin.collectSketch(
          // spread: tokenize + 4 md5 digests per token is the heavy map
          // stage over a one-split local scan (identity at cluster scale)
          Tables.spread(Tables.documents(spark, dir), col("doc_id"))
            .select(explode(tokens(col("text"))).as("token")),
          "token", CmsDepth, CmsWidth,
          hashFn = graft.functions.Hash60.catalogSalted(spark)))
      })._2
  }

  def cmsTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CountMin
    import spark.implicits._
    val sketch = corpusTokenSketch(spark, dir).cells.toDF("fn", "cell", "c")
    val top = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("exact_c"))
      .orderBy(col("exact_c").desc, col("token"))
      .limit(20)
    CountMin.estimate(sketch, top, "token", CmsDepth, CmsWidth,
        hashFn = graft.functions.Hash60.catalogSalted(spark))
      .withColumn("overestimate", (col("cms_c") - col("exact_c")).cast("long"))
      .select(col("token"), col("exact_c"), col("cms_c"), col("overestimate"))
      .orderBy(col("exact_c").desc, col("token"))
  }

  private val cmsTokenCountsSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |    t -> t <> '')) AS token
      |  FROM documents),
      |cells AS (
      |  SELECT u.fn,
      |    CAST(('0x' || substr(md5(CAST(u.fn AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT)
      |      % 1024 AS cell
      |  FROM toks CROSS JOIN unnest(range(0, 4)) AS u(fn)),
      |sketch AS (SELECT fn, cell, count(*) AS c FROM cells GROUP BY 1, 2),
      |top AS (
      |  SELECT token, count(*) AS exact_c FROM toks
      |  GROUP BY 1 ORDER BY exact_c DESC, token LIMIT 20),
      |est AS (
      |  SELECT t.token, t.exact_c, min(s.c) AS cms_c
      |  FROM top t
      |  CROSS JOIN unnest(range(0, 4)) AS u(fn)
      |  JOIN sketch s
      |    ON s.fn = u.fn
      |   AND s.cell = CAST(('0x' || substr(md5(CAST(u.fn AS VARCHAR) || ':' || t.token), 1, 15)) AS BIGINT)
      |      % 1024
      |  GROUP BY 1, 2)
      |SELECT token, exact_c, CAST(cms_c AS BIGINT) AS cms_c,
      |  CAST(cms_c - exact_c AS BIGINT) AS overestimate
      |FROM est ORDER BY exact_c DESC, token""".stripMargin

  /** Exact heavy hitters with a CMS pre-filter
    * ([[graft.operators.CountMin.heavyHitters]]): tokens occurring in
    * ≥ φ = 1/200 of all occurrences, computed exactly with the
    * exact-count shuffle bounded to candidate occurrences only — see
    * the operator Scaladoc for the guarantee argument. The sketch
    * serves from the memoized [[corpusTokenSketch]] artifact, so the
    * call makes exactly ONE corpus pass (map-side estimate + exact
    * cut) — the pass EXACTNESS inherently requires; nothing is
    * persisted, and the final cut bounds the result at ≤ φ⁻¹ rows by
    * construction, so it collects to a local relation
    * (CacheHygieneSpec pins both the local relation and the
    * no-cache-residue contract).
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("token"))
    graft.operators.Eager.localize(
      graft.operators.CountMin
        .heavyHitters(toks, "token", phiInverse = 200L, depth = CmsDepth,
          width = CmsWidth,
          hashFn = graft.functions.Hash60.catalogSalted(spark),
          prebuiltCells = Some(corpusTokenSketch(spark, dir)))
        .orderBy(col("exact_c").desc, col("token")))
  }

  private val cmsHeavyHittersSql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |    t -> t <> '')) AS token
      |  FROM documents),
      |thr AS (
      |  SELECT CAST((count(*) + 199) // 200 AS BIGINT) AS threshold FROM toks),
      |cells AS (
      |  SELECT u.fn,
      |    CAST(('0x' || substr(md5(CAST(u.fn AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT)
      |      % 1024 AS cell
      |  FROM toks CROSS JOIN unnest(range(0, 4)) AS u(fn)),
      |sketch AS (SELECT fn, cell, count(*) AS c FROM cells GROUP BY 1, 2),
      |exact AS (
      |  SELECT token, count(*) AS exact_c FROM toks GROUP BY 1),
      |est AS (
      |  SELECT e.token, e.exact_c, min(s.c) AS cms_c
      |  FROM exact e
      |  CROSS JOIN unnest(range(0, 4)) AS u(fn)
      |  JOIN sketch s
      |    ON s.fn = u.fn
      |   AND s.cell = CAST(('0x' || substr(md5(CAST(u.fn AS VARCHAR) || ':' || e.token), 1, 15)) AS BIGINT)
      |      % 1024
      |  GROUP BY 1, 2)
      |SELECT token, exact_c, CAST(cms_c AS BIGINT) AS cms_c, threshold
      |FROM est, thr WHERE exact_c >= threshold
      |ORDER BY exact_c DESC, token""".stripMargin

  /** Sparse cosine similarity via an inverted-index join (the
    * all-pairs-similarity shape of Bayardo et al.): documents as
    * term-frequency vectors, dot products accumulated over the SHARED
    * tokens only — a join keyed by token, never a dense cross-join. Dot
    * and squared norms are integer sums (exact under any merge order),
    * so cos_sim is bit-deterministic; rounded BEFORE ranking so the
    * top-20 cut is stable across engines.
    *
    * Scale shape: the shuffle key is the token (inverted index); pair
    * cost is Σ_t df(t)² over shared terms, not n² — but a hot token
    * (stopword-grade df) makes that quadratic in practice. The
    * standard Bayardo-style guard is applied: tokens with df > `maxDf`
    * are dropped from the INDEX side only (index pruning — norms keep
    * every token), bounding any one token's pair contribution at
    * maxDf·(maxDf−1)/2. The similarity is EXACT whenever maxDf ≥ the
    * corpus max df — the catalog query passes maxDf = the slice size,
    * so its results are bit-identical to the uncapped form and the
    * oracle mirrors the same ceiling.
    */
  def sparseCosineTopPairs(docs: DataFrame, maxDf: Long,
      topK: Int): DataFrame = {
    // no persist: every consumer (norms aggregate, the df filter when
    // capped, both inverted-index join sides) shares the (doc_id,
    // token) aggregation's exchange via physical exchange reuse — one
    // tokenization+count pass without materializing a cache (r18 A/B,
    // same device as bigram_lm_top)
    val tf = docs
      .select(col("doc_id"), explode(col("terms")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    // df ceiling on the index side: the keep-set join shuffles on the
    // SAME token key as the pair join below, so it co-partitions with
    // the work it is protecting. Long.MaxValue — the uncapped
    // spelling — skips the df aggregate + join entirely (no df can
    // reach it), removing two plan stages a caller who has already
    // proven the cap vacuous would otherwise pay per query.
    val idx =
      if (maxDf == Long.MaxValue) tf
      else {
        val keep = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDf).select(col("token"))
        tf.join(keep, Seq("token"))
      }
    val a = idx.select(col("token"), col("doc_id").as("a_id"),
      col("tf").as("a_tf"))
    val b = idx.select(col("token"), col("doc_id").as("b_id"),
      col("tf").as("b_tf"))
    // no broadcast HINT on the norms joins: norms is doc-count-sized,
    // which a public caller may bring at corpus scale — AQE broadcasts
    // it when it is actually small (the slice case) and falls back to
    // a co-keyed shuffle join when it is not
    a.join(b, "token").where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("a_tf") * col("b_tf")).as("dot"))
      .join(norms.select(col("doc_id").as("a_id"),
        col("n2").as("na2")), "a_id")
      .join(norms.select(col("doc_id").as("b_id"),
        col("n2").as("nb2")), "b_id")
      .withColumn("cos_sim", round(col("dot").cast("double")
        / (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6))
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a_id"), col("b_id"))
      .limit(topK)
  }

  /** Catalog form: doc_id < 100 slice, uncapped. df over a ≤100-doc
    * slice can never exceed 100, so the r17 form's maxDf = 100 ceiling
    * was provably a no-op (the committed no-op gate in RetrievalSpec
    * compares capped-at-100 vs uncapped on this very slice); passing
    * the uncapped spelling drops the vacuous df aggregate + keep join
    * from every serving plan while the oracle keeps its explicit
    * `HAVING count(*) <= 100` ceiling — same rows, hash-identical.
    */
  def sparseCosinePairs(spark: SparkSession, dir: String): DataFrame =
    sparseCosineTopPairs(
      Tables.documents(spark, dir).where(col("doc_id") < 100)
        .select(col("doc_id"), tokens(col("text")).as("terms")),
      maxDf = Long.MaxValue, topK = 20)

  private val sparseCosinePairsSql =
    """WITH tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |          t -> t <> '')) AS token
      |        FROM documents WHERE doc_id < 100)
      |  GROUP BY 1, 2),
      |norms AS (
      |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tf GROUP BY 1),
      |keep AS (
      |  SELECT token FROM tf GROUP BY 1 HAVING count(*) <= 100),
      |idx AS (SELECT tf.* FROM tf JOIN keep USING (token)),
      |dots AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      |  FROM idx a JOIN idx b ON a.token = b.token AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id,
      |  round(CAST(dot AS DOUBLE)
      |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos_sim
      |FROM dots JOIN norms na ON na.doc_id = a_id
      |          JOIN norms nb ON nb.doc_id = b_id
      |ORDER BY cos_sim DESC, a_id, b_id LIMIT 20""".stripMargin

  /** Quality scoring: stopword ratio, short-token ratio, length flags —
    * the classic pretraining-corpus filters, as pure column expressions.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to")
    Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(stop.map(lit(_)): _*))))
      .withColumn("n_short", size(filter(col("toks"), t => length(t) <= 2)))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("n_stop") / greatest(col("n_tokens"), lit(1)), 4).as("stopword_ratio"),
        round(col("n_short") / greatest(col("n_tokens"), lit(1)), 4).as("short_ratio"),
        when(col("n_tokens") < 20, "too_short")
          .when(col("n_tokens") > 500, "too_long")
          .otherwise("ok").as("length_flag"))
      .where(col("doc_id") < 200)
      .orderBy(col("doc_id"))
  }

  private val qualityScoreSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id, len(toks) AS n_tokens,
      |  round(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
      |        / greatest(len(toks), 1), 4) AS stopword_ratio,
      |  round(CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE)
      |        / greatest(len(toks), 1), 4) AS short_ratio,
      |  CASE WHEN len(toks) < 20 THEN 'too_short'
      |       WHEN len(toks) > 500 THEN 'too_long'
      |       ELSE 'ok' END AS length_flag
      |FROM t ORDER BY doc_id""".stripMargin

  /** Unigram log-probability quality score — the distributed shape of
    * the CCNet/KenLM "perplexity filter": train unigram frequencies over
    * the corpus (one token groupBy), score each document by its mean
    * token log-probability. The per-doc sum folds over the SORTED
    * log-prob list so float addition order — and therefore the rounded
    * score — is identical across engines and partitionings. The
    * frequency table is vocabulary-sized (bounded, Zipf-truncatable at
    * scale) → broadcast; the corpus side is scanned once map-side.
    */
  def logprobScore(spark: SparkSession, dir: String): DataFrame = {
    // one LAZY plan (r18): the r17 form cached the full exploded token
    // stream and ran a blocking head() for the grand total inside the
    // builder. The LM side (freq) makes exactly one corpus pass either
    // way; the scored side is a ≤100-doc slice whose doc_id predicate
    // now pushes into its own pruned scan instead of reading the
    // corpus-wide cache; and the total rides along as a 1-row
    // broadcast cross join, so ln(c/total) is unchanged arithmetic.
    val freq = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("t"))
    Tables.documents(spark, dir).where(col("doc_id") < 100)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .join(broadcast(freq), "token")
      .crossJoin(broadcast(total))
      .withColumn("lp", log(col("c").cast("double") / col("t").cast("double")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(
          aggregate(sort_array(collect_list(col("lp"))), lit(0.0),
            (a, x) => a + x) / count(lit(1)), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  private val logprobScoreSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS token
      |  FROM documents),
      |freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
      |total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM freq),
      |lp AS (
      |  SELECT toks.doc_id, ln(CAST(freq.c AS DOUBLE) / total.t) AS lp
      |  FROM toks JOIN freq USING (token) CROSS JOIN total
      |  WHERE toks.doc_id < 100)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(list_reduce(list_sort(list(lp)), (a, b) -> a + b) / count(*), 4)
      |    AS avg_logprob
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Feature hashing (hashing-vectorizer) in sparse form: token →
    * bucket = md5-hash mod 64, per-doc term frequencies per bucket.
    * The text→fixed-dim-vector bridge into the ANN/dedup operators; a
    * map-side expression + one (doc_id, bucket) groupBy with map-side
    * combine. md5-based so the oracle reproduces the bucketing exactly.
    */
  def hashedTf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .where(col("doc_id") < 50)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .withColumn("bucket",
        pmod(graft.queries.DedupQueries.md5Long(col("token")), lit(64)))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("doc_id"), col("bucket"))

  private val hashedTfSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS token
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id,
      |  CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % 64 AS bucket,
      |  count(*) AS tf
      |FROM toks GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin

  /** Language-ID heuristic: stopword-marker scores per language family +
    * CJK codepoint detection, deterministic argmax with fixed precedence.
    * (On the synthetic corpus every language shares the same vocabulary,
    * so this mostly predicts 'en' — the operator contract is determinism,
    * not accuracy, and real marker lists drop in unchanged.)
    */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    def score(markers: Seq[String]) = {
      val toks = tokens(col("text"))
      size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
    }
    Tables.documents(spark, dir)
      .withColumn("en_score", score(Seq("the", "a", "of", "and")))
      .withColumn("de_score", score(Seq("der", "die", "das", "und")))
      .withColumn("es_score", score(Seq("el", "la", "los", "y")))
      .withColumn("fr_score", score(Seq("le", "la", "les", "et")))
      .withColumn("has_cjk", col("text").rlike("[\\x{4e00}-\\x{9fff}]"))
      .select(
        col("doc_id"), col("lang").as("true_lang"),
        when(col("has_cjk"), "zh")
          .when(col("de_score") > col("en_score"), "de")
          .when(col("es_score") > col("en_score"), "es")
          .when(col("fr_score") > col("en_score"), "fr")
          .otherwise("en").as("predicted_lang"))
      .where(col("doc_id") < 100)
      .orderBy(col("doc_id"))
  }

  private val languageIdSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks,
      |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
      |  FROM documents WHERE doc_id < 100),
      |s AS (
      |  SELECT doc_id, lang, has_cjk,
      |    len(list_filter(toks, x -> x IN ('the','a','of','and'))) AS en_score,
      |    len(list_filter(toks, x -> x IN ('der','die','das','und'))) AS de_score,
      |    len(list_filter(toks, x -> x IN ('el','la','los','y'))) AS es_score,
      |    len(list_filter(toks, x -> x IN ('le','la','les','et'))) AS fr_score
      |  FROM t)
      |SELECT doc_id, lang AS true_lang,
      |  CASE WHEN has_cjk THEN 'zh'
      |       WHEN de_score > en_score THEN 'de'
      |       WHEN es_score > en_score THEN 'es'
      |       WHEN fr_score > en_score THEN 'fr'
      |       ELSE 'en' END AS predicted_lang
      |FROM s ORDER BY doc_id""".stripMargin

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (identical hex in both engines).
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"))
      .where(col("doc_id") < 100)
      .orderBy(col("doc_id"))

  private val fingerprintsSql =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  /** BPE-ish token counting: the GPT-2-style pre-tokenizer regex
    * (contractions | space-prefixed letter runs | number runs |
    * punctuation runs) — identical leftmost-first semantics in Java
    * regex and DuckDB's RE2 for this pattern.
    */
  def tokenCountBpe(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"),
          lit("'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))
          .as("n_bpe_tokens"),
        size(tokens(col("text"))).as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  private val tokenCountBpeSql =
    """SELECT doc_id, lang,
      |  len(regexp_extract_all(text,
      |    '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_bpe_tokens,
      |  len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints (MOSS-style): polynomial rolling hash of
    * 8-char k-grams, minimum per 4-hash window, distinct minima = the
    * document's fingerprint set. Every stage is a separate projection
    * (staged intermediates — inlining HOFs re-evaluates them per element
    * access).
    */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val k = 8
    val w = 4
    val p = 1000000007L
    // persist() is a real materialization barrier, not just a staged
    // projection: CollapseProject re-inlines withColumn stages when the
    // downstream references them (size + slice both read `hashes`),
    // which turns window extraction O(grams²) — measured 13.6 s → 1 s
    // at sf0.1 on 40 docs
    val hashed = Tables.documents(spark, dir)
      .where(col("doc_id") < 40)
      .withColumn("grams",
        transform(sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
          i => col("text").substr(i, lit(k))))
      .withColumn("hashes",
        transform(col("grams"), g =>
          aggregate(transform(sequence(lit(1), length(g)),
            i => ascii(g.substr(i, lit(1))).cast("long")),
            lit(0L), (acc, c) => pmod(acc * 31 + c, lit(p)))))
      .select(col("doc_id"), col("hashes"))
      .persist()
    hashed
      .withColumn("mins",
        array_distinct(transform(
          sequence(lit(1), greatest(size(col("hashes")) - (w - 1), lit(1))),
          j => array_min(slice(col("hashes"), j, lit(w))))))
      .select(col("doc_id"), explode(col("mins")).as("fingerprint"))
      .orderBy(col("doc_id"), col("fingerprint"))
  }

  private val winnowFingerprintsSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(length(text) - 7, 1) + 1),
      |      i -> substr(text, i, 8)) AS grams
      |  FROM documents WHERE doc_id < 40),
      |h AS (
      |  SELECT doc_id,
      |    list_transform(grams, gr ->
      |      list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(1, length(gr) + 1),
      |            i -> CAST(ascii(substr(gr, i, 1)) AS BIGINT))),
      |        (acc, c) -> (acc * 31 + c) % 1000000007)) AS hashes
      |  FROM g),
      |m AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(hashes) - 3, 1) + 1),
      |      j -> list_aggregate(list_slice(hashes, j, j + 3), 'min'))) AS mins
      |  FROM h)
      |SELECT doc_id, unnest(mins) AS fingerprint FROM m
      |ORDER BY doc_id, fingerprint""".stripMargin

  /** TF-IDF top-5 terms per document (doc_id < 100 slice): tf from one
    * (doc, term) groupBy; df re-aggregated from the tf table (already
    * unique per (doc, term) → a plain count — no second pass over raw
    * tokens); N computed once driver-side. tf feeds both the df
    * aggregate and the scoring join WITHOUT a persist barrier: the
    * slice is a constant 100 docs at any corpus size (doc_id < 100
    * pushes to the scan), so recomputing the tiny tf lineage costs two
    * pruned scans — a leaked cached RDD per catalog run costs more
    * (VERDICT r5 "what's wrong" #2). Ranked per doc by (rounded score
    * desc, term asc) — rounding BEFORE ranking keeps the cross-engine
    * order stable at float boundaries.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).where(col("doc_id") < 100)
    // N rides along as a lazy 1-row broadcast instead of a blocking
    // count() in the builder (r18): same double (long count cast to
    // double) reaching the same log/division
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfreq), "term") // vocabulary-sized — never shuffle tf for it
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("nd").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  private val tfidfTopTermsSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS term
      |  FROM documents WHERE doc_id < 100),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 100),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
      |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 4) AS score
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY doc_id ORDER BY score DESC, term) AS rank
      |      FROM scored)
      |SELECT doc_id, rank, term, tf, df, score
      |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin

  /** Deterministic 25% content-hash sample (graft.operators.Sampling):
    * the selected set is a pure function of text content — identical in
    * any engine computing standard md5, any partitioning, any run.
    */
  def hashSampleDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.hashSample(
      Tables.documents(spark, dir), col("text"), 0.25)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  private[queries] val hashSampleDocsSql =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(text), 1, 8) < '40000000'
      |ORDER BY doc_id""".stripMargin

  /** Weighted sample without replacement (Efraimidis-Spirakis A-ES,
    * content-hash randomness — graft.operators.Sampling.weightedSample):
    * 100 docs with inclusion probability ∝ n_chars. Deterministic, so
    * the DuckDB oracle reproduces the exact kept set; the plan is one
    * map-side key + a global top-k (no corpus shuffle).
    */
  def weightedSampleDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.weightedSample(
      Tables.documents(spark, dir), col("text"), col("n_chars"),
      k = 100, tie = col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val weightedSampleDocsSql =
    """WITH keyed AS (
      |  SELECT doc_id, lang, source, n_chars,
      |    ln((CAST(('0x' || substr(md5(text), 1, 13)) AS BIGINT) + 0.5)
      |       / 4503599627370496.0) / n_chars AS k
      |  FROM documents WHERE n_chars > 0),
      |top AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 100)
      |SELECT doc_id, lang, source, n_chars FROM top ORDER BY doc_id""".stripMargin

  /** Stratified deterministic sample: per-language rates (en 25%,
    * zh 75%, others 50%) via one CASE threshold — a single map-side
    * filter, no per-stratum passes.
    */
  def stratifiedSampleCounts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratifiedHashSample(
      Tables.documents(spark, dir), col("text"), col("lang"),
      Map("en" -> 0.25, "zh" -> 0.75), defaultFraction = 0.5)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy(col("lang"))

  private val stratifiedSampleCountsSql =
    """SELECT lang, count(*) AS n_sampled FROM documents
      |WHERE substr(md5(text), 1, 8) <
      |  CASE lang WHEN 'en' THEN '40000000'
      |            WHEN 'zh' THEN 'c0000000'
      |            ELSE '80000000' END
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Corpus bigram language-model table (the KenLM-ish count/cond-prob
    * shape quality filters train on): bigram counts via one exploded
    * groupBy (map-side combine carries it — the (bigram) key is
    * high-cardinality and uniform), per-predecessor totals re-aggregated
    * from the count table (vocabulary-sized → broadcast back), top 20 by
    * count. At 100 TB: two bounded shuffles, no row ever carries more
    * than one gram.
    */
  def bigramLmTop(spark: SparkSession, dir: String): DataFrame = {
    // spread: the bigram explode is the CPU-heavy map stage and the
    // corpus arrives as one scan split locally (Tables.spread)
    // no persist: both consumers (predecessor totals + the join) share
    // the bigram aggregation's exchange via physical exchange reuse —
    // one explode+count pass, no cache materialization of the
    // ~corpus-bigram-sized table (r18 A/B vs the persisted form)
    val bi = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .withColumn("toks", tokens(col("text")))
      .select(explode(QualityQueries.wordNgrams(col("toks"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_bigram"))
    val c1 = bi.groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum(col("n_bigram")).cast("long").as("n_w1"))
    bi.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(broadcast(c1), "w1")
      .select(col("bigram"), col("n_bigram"),
        round(col("n_bigram").cast("double") / col("n_w1"), 4).as("cond_p"))
      .orderBy(col("n_bigram").desc, col("bigram"))
      .limit(20)
  }

  private val bigramLmTopSql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |bi AS (
      |  SELECT unnest(CASE WHEN len(t) >= 2
      |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
      |    ELSE [] END) AS bigram
      |  FROM toks),
      |c2 AS (SELECT bigram, count(*) AS n_bigram FROM bi GROUP BY bigram),
      |c1 AS (
      |  SELECT split_part(bigram, ' ', 1) AS w1, CAST(sum(n_bigram) AS BIGINT) AS n_w1
      |  FROM c2 GROUP BY 1)
      |SELECT bigram, n_bigram,
      |  round(CAST(n_bigram AS DOUBLE) / n_w1, 4) AS cond_p
      |FROM c2 JOIN c1 ON split_part(bigram, ' ', 1) = c1.w1
      |ORDER BY n_bigram DESC, bigram LIMIT 20""".stripMargin

  /** BPE tokenizer training over the corpus ([[graft.operators.Bpe]]):
    * distributed word counting, driver merge loop on the bounded
    * vocabulary. Output = the learned merge table (top 20 merges) —
    * exact integer counts + lexicographic tie-breaks make it a pure
    * function of the corpus, so since round 10 the whole training loop
    * is hash-checked: the oracle ([[bpeMergesSql]]) replays all 20
    * merge selections in DuckDB from the raw corpus. The algorithm is
    * additionally hand-verified in BpeSpec.
    */
  /** Merge table trained once per (JVM, sfDir) — the same build-once
    * treatment as the IVF index and PQ codebooks; `bpe_merges` exposes
    * it, `bpe_token_stats` applies it.
    */
  private val bpeModels =
    new Tables.DataKeyedMemo[Seq[graft.operators.Bpe.Merge]]()

  def bpeModel(spark: SparkSession, dir: String): Seq[graft.operators.Bpe.Merge] =
    bpeModels.get(dir) {
      val docs = Tables.documents(spark, dir)
        .withColumn("toks", tokens(col("text")))
      graft.operators.Bpe.train(docs, "toks", numMerges = 20)
    }

  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.mergesDf(spark, bpeModel(spark, dir))
      .orderBy(col("rank"))

  /** DuckDB replay of the BPE merge loop (VERDICT r9 #6 stretch): the
    * trained-artifact echo becomes hash-checkable because merge
    * selection is a deterministic argmax over exact integer counts —
    * so 20 mechanically-generated chained CTE steps re-run the loop
    * from the raw corpus. Each step: recount adjacent symbol pairs,
    * pick the (freq DESC, left, right) winner, rewrite every word.
    *
    * Two SQL devices make the replay exact:
    *   - Words are encoded as symbol strings joined by a DOUBLED
    *     chr(1) separator with the pattern consuming one separator
    *     char from each side (`␁l␁␁r␁` → `␁lr␁`): `replace()`'s
    *     left-to-right non-overlapping scan then fuses runs exactly
    *     like the trainer's greedy rewrite ([a,a,a,a] → [aa,aa], not
    *     [aa,a,a]), and the surviving half-separators keep symbol
    *     boundaries exact (no suffix/prefix false matches). The two
    *     corpus preconditions this rests on — chr(1) absent from
    *     tokens, and ASCII-only text so DuckDB's UTF-8 and Scala's
    *     UTF-16 tie-break collations coincide — are ASSERTED by the
    *     `pre` CTE (ADVICE r10): a violating corpus fails the oracle
    *     run with a named error() instead of a confusing hash
    *     mismatch.
    *   - Every step CTE is MATERIALIZED: each is referenced twice
    *     (pair count + rewrite), so default inlining would expand the
    *     20-step chain 2^20-fold.
    *
    * Replays the trainer's exact contract: same tokenizer, top-100000
    * (count DESC, word) vocab cut, code-point symbol split
    * (`substring(w, i, 1)` is code-point-based in DuckDB), and ASCII
    * corpus so Scala's UTF-16 and DuckDB's UTF-8 tie-break orders
    * coincide.
    */
  private val bpeMergesSql: String = {
    val head =
      """WITH
        |toks AS MATERIALIZED (
        |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS w
        |  FROM documents),
        |pre AS MATERIALIZED (
        |  SELECT count(*) AS bad FROM toks
        |  WHERE strlen(w) <> length(w) OR contains(w, chr(1))),
        |wc AS MATERIALIZED (
        |  SELECT w, count(*) AS c FROM toks, pre
        |  WHERE CASE WHEN pre.bad > 0 THEN error('bpe_merges oracle precondition violated: ' ||
        |    'corpus tokens must be ASCII (UTF-8/UTF-16 tie-break parity) and free of chr(1) (the separator)')
        |    ELSE true END
        |  GROUP BY 1 ORDER BY c DESC, w LIMIT 100000),
        |s0 AS MATERIALIZED (
        |  SELECT repeat(chr(1), 2) ||
        |    list_aggregate(list_transform(range(1, length(w) + 1),
        |      i -> substring(w, i, 1)), 'string_agg', repeat(chr(1), 2)) ||
        |    repeat(chr(1), 2) AS syms, c
        |  FROM wc)""".stripMargin
    def step(i: Int): String = {
      val p = i - 1
      s""",
         |b$i AS MATERIALIZED (
         |  SELECT l, r, f FROM (
         |    SELECT lst[i] AS l, lst[i + 1] AS r, sum(c) AS f
         |    FROM (SELECT list_filter(string_split(syms, repeat(chr(1), 2)), x -> x <> '') AS lst, c FROM s$p),
         |      unnest(range(1, len(lst))) AS u(i)
         |    GROUP BY 1, 2)
         |  ORDER BY f DESC, l, r LIMIT 1),
         |s$i AS MATERIALIZED (
         |  SELECT replace(syms, chr(1) || b$i.l || repeat(chr(1), 2) || b$i.r || chr(1),
         |                 chr(1) || b$i.l || b$i.r || chr(1)) AS syms, c
         |  FROM s$p, b$i)""".stripMargin
    }
    val tail = "\nSELECT * FROM (\n" +
      (1 to 20).map(i =>
        s"SELECT ${i - 1} AS rank, l AS left_sym, r AS right_sym, " +
          s"CAST(f AS BIGINT) AS freq FROM b$i").mkString("\nUNION ALL\n") +
      "\n) ORDER BY rank"
    head + (1 to 20).map(step).mkString + tail
  }

  /** The trained tokenizer APPLIED corpus-wide: encode every word with
    * the broadcast merge table (the runtime BPE rule — greedy
    * lowest-rank-first), then per-source compression stats: words,
    * BPE symbols, avg symbols/word. Map-side encode + one bounded
    * groupBy; at 100 TB the merge table is KBs broadcast and the UDF
    * is the same per-token work a production tokenizer does.
    * Oracle-checked via [[OracleGen]]: the iterative merge loop is not
    * SQL-expressible, but its RESULT per distinct word is — the
    * generator encodes the corpus vocabulary driver-side and inlines a
    * (word → n_syms) VALUES table, so DuckDB independently re-runs the
    * tokenization, word counting, weighting, and ratio math. encodeWord
    * itself is hand-gated in BpeSpec.
    */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame = {
    val rank = graft.operators.Bpe.rankMap(bpeModel(spark, dir))
    val bc = spark.sparkContext.broadcast(rank)
    val nSyms = udf((w: String) =>
      graft.operators.Bpe.encodeWordRanked(w, bc.value).length)
    // encode each DISTINCT (source, word) once and weight by count —
    // the corpus is Zipf-distributed, so per-occurrence encoding would
    // re-run the merge loop millions of times on the same few words
    // (the same word-count shape Bpe.train itself consumes). Integer
    // (n_syms × count) sums also make the ratio bit-deterministic.
    Tables.documents(spark, dir)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_syms", nSyms(col("w")).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("n_syms") * col("c")).as("n_bpe_symbols"),
        round(sum(col("n_syms") * col("c")).cast("double")
          / sum(col("c")), 4).as("avg_syms_per_word"))
      .orderBy(col("source"))
  }

  private def bpeTokenStatsOracle(spark: SparkSession, dir: String): String = {
    val rank = graft.operators.Bpe.rankMap(bpeModel(spark, dir))
    val words = Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0)).sorted
    val vals = words.map { w =>
      s"(${OracleGen.str(w)},${graft.operators.Bpe.encodeWordRanked(w, rank).length})"
    }.mkString(",")
    s"""WITH syms(w, n_syms) AS (VALUES $vals),
       |tok AS (
       |  SELECT source,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS w
       |  FROM documents),
       |wc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2)
       |SELECT wc.source,
       |  CAST(sum(wc.c) AS BIGINT) AS n_words,
       |  CAST(sum(s.n_syms * wc.c) AS BIGINT) AS n_bpe_symbols,
       |  round(CAST(sum(s.n_syms * wc.c) AS DOUBLE) / sum(wc.c), 4) AS avg_syms_per_word
       |FROM wc JOIN syms s ON s.w = wc.w
       |GROUP BY wc.source ORDER BY wc.source""".stripMargin
  }

  /** BM25 ranked retrieval: documents 0..7 act as queries against the
    * rest of the corpus (doc_id ≥ 8) — the query→document retrieval
    * primitive behind retrieval-based decontamination, RAG corpus
    * search, and retriever hard-negative mining. Lucene-shape BM25
    * (k1=1.2, b=0.75, idf = ln(1 + (N−df+0.5)/(df+0.5))); N and avgdl
    * are derived from docs with ≥1 token (the only docs an inverted
    * index ever sees), identically in both engines.
    *
    * Scale shape: term frequencies come from the build-once posting
    * table ([[bm25Index]] — ONE tokenization pass at build time that
    * carries dl alongside the explode, no doc-length join), written
    * term-clustered; df and the 1-row (N, avgdl) stats are ALSO index
    * artifacts (Lucene keeps docFreq in the term dictionary and norms
    * at index time), read back and broadcast. The query term set —
    * driver-sized by contract — is pushed into the posting scan as an
    * isin predicate (row-group skip: the inverted-index seek), so the
    * only corpus-sized shuffle is the (query_id, doc_id) partial
    * aggregation — volume is matched postings, never the corpus.
    * Per-term scores fold in sorted order (cross-engine float
    * determinism, same as [[QualityQueries.sourceTokenDivergence]])
    * and round(4) BEFORE ranking; top-5 per query ranks through the
    * bounded-state [[graft.operators.TopNByKey]] aggregate (≤5 rows
    * per query per map task) — the window form is exactly what the
    * DuckDB oracle replays.
    */
  /** BM25 inverted index (doc_id, dl, term, tf) over the corpus slice,
    * built ONCE per (JVM, sfDir) into the per-pid cache dir — the
    * build-once treatment every retrieval path gets (IVF vectors,
    * MaxSim pool): tokenizing the corpus is the INDEX BUILD, queries
    * serve from the posting table. Also replaces the tf persist: both
    * consumers (df aggregate, scoring join) read the parquet back.
    */
  private val bm25Cache = new Tables.DataKeyedMemo[String]()

  def bm25Index(spark: SparkSession, dir: String): String =
    bm25Cache.get(dir) {
      graft.operators.Bm25.build(
        Tables.spread(Tables.documents(spark, dir)
            .where(col("doc_id") >= 8), col("doc_id"))
          .select(col("doc_id"), tokens(lower(col("text"))).as("terms")),
        s"/tmp/graft_index/${Tables.cacheDirName(dir)}").tfPath
    }

  /** The query batch's DISTINCT (query_id, term) pairs, collected once
    * per (JVM, data version) — driver-sized by contract (query docs are
    * the bounded side). Memoized so the two consumers per hybrid query
    * (BM25 arm construction + its isin pushdown) don't re-run the
    * tokenize-and-collect driver job on every call.
    */
  private val bm25QueryCache =
    new Tables.DataKeyedMemo[Array[(Long, String)]]()

  private def bm25QueryPairs(spark: SparkSession, dir: String): Array[(Long, String)] =
    bm25QueryCache.get(dir) {
      Tables.documents(spark, dir).where(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(tokens(lower(col("text"))))).as("term"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }

  /** BM25 (query_id, doc_id, score) over the posting table — the shared
    * scoring stage behind [[bm25TopDocs]] and the lexical arm of
    * [[hybridRrfTopDocs]], as a thin slice-contract wrapper over the
    * public parameterized operator ([[graft.operators.Bm25]]).
    */
  def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val base = bm25Index(spark, dir).stripSuffix("/bm25_tf")
    graft.operators.Bm25.scoredFromPairs(spark,
      graft.operators.Bm25.Index(base), bm25QueryPairs(spark, dir))
  }

  def bm25TopDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bm25.topDocs(bm25Scored(spark, dir), k = 5)

  /** The BM25 CTE chain ending in scored(query_id, doc_id, score) —
    * shared by the bm25_top_docs oracle (rank ≤ 5) and the hybrid-RRF
    * oracle (rank ≤ 20), so the two oracles cannot drift.
    */
  private val bm25ScoredCtes =
    """corpus AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS ts
      |  FROM documents WHERE doc_id >= 8),
      |toks AS (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM corpus),
      |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM tf)),
      |qterms AS (
      |  SELECT doc_id AS query_id,
      |    unnest(list_distinct(
      |      list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> ''))) AS term
      |  FROM documents WHERE doc_id < 8),
      |terms AS (
      |  SELECT q.query_id, tf.doc_id,
      |    ln(1E0 + (s.n_docs - d.df + 5E-1) / (d.df + 5E-1))
      |      * (tf.tf * 2.2E0)
      |      / (tf.tf + 1.2E0 * (2.5E-1 + 7.5E-1 * tf.dl / s.avgdl)) AS sc
      |  FROM tf JOIN qterms q USING (term) JOIN dfreq d USING (term)
      |  CROSS JOIN stats s),
      |scored AS (
      |  SELECT query_id, doc_id,
      |    round(list_reduce(list_sort(list(sc)), (a, b) -> a + b), 4) AS score
      |  FROM terms GROUP BY 1, 2)""".stripMargin

  // Tie hazard note: both engines rank on the round(4) score with
  // doc_id as the tie-break, so a 4-decimal score collision orders
  // identically on both sides — gated by RetrievalSpec's constructed
  // identical-doc collision through this exact path (VERDICT r16 #8).
  private val bm25TopDocsSql =
    s"""WITH $bm25ScoredCtes,
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |      FROM scored)
       |SELECT query_id, rank, doc_id, score
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Late-interaction (MaxSim) retrieval over chunk embeddings —
    * ColBERT-style scoring (Khattab & Zaharia 2020) re-expressed as two
    * partial aggregations: score(q, d) = Σ over q's chunks of the max
    * cosine against d's chunks. Docs are split into 16-token chunks and
    * each chunk carries a 16-dim deterministic pseudo-embedding
    * (md5-derived, the [[graft.sources.Multimodal]] stub-encoder
    * construction — a real encoder replaces exactly that expression),
    * so the whole pipeline is oracle-checkable.
    *
    * Scale shape: the query side (8 docs → ~a few dozen chunks) is a
    * broadcast nested-loop against the corpus chunk scan — chunking
    * and the per-pair cosine are map-side; the max-per-(query chunk,
    * doc) and sum-per-(query, doc) are partial aggregations whose
    * shuffle volume is (query chunks × matched docs), never the corpus
    * chunk count. Per-chunk maxes fold into the final score in sorted
    * order (cross-engine float determinism) and round(4) BEFORE
    * ranking; top-5 per query via the bounded-state
    * [[graft.operators.TopNByKey]].
    */
  /** The maxsim chunk table: (doc_id, cidx, feat) — 16-token chunks,
    * 16-dim md5-derived stub embeddings. The ONE definition of the
    * chunk/feature scheme, shared by the catalog query and the
    * DebugMaxsim stage-timing harness so their plans cannot diverge.
    * Spread before chunking: locally the corpus is one scan split and
    * the chunk + 16-digest feature stage is the expensive map work
    * (identity at cluster scale — Tables.spread); the query-side
    * doc_id filter still pushes through the exchange.
    */
  /** ONE definition of the pooled-LSH vector-arm parameters, shared by
    * the approximate-MaxSim path, the hybrid-RRF vector arm, and their
    * oracle generators: the engine and the oracle must build the SAME
    * candidate stage by construction — a drifted seed or probe width
    * would only surface as an opaque Verify hash failure.
    */
  private val MsDim = 16
  private val MsSeed = 42L
  private val MsPerQuery = 20
  private val MsProbeBits = 3

  def maxsimChunks(spark: SparkSession, dir: String): DataFrame = {
    val win = 16
    Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .withColumn("ts", tokens(lower(col("text"))))
      .withColumn("n_ch", when(size(col("ts")) <= win, lit(1))
        .otherwise((size(col("ts")) - win + (win - 1))
          .divide(win).cast("int") + 1))
      .withColumn("cidx", explode(sequence(lit(0), col("n_ch") - 1)))
      .withColumn("chunk_text",
        array_join(slice(col("ts"), col("cidx") * win + 1, lit(win)), " "))
      .withColumn("feat", transform(sequence(lit(0), lit(15)), j =>
        ((DedupQueries.md5Long(concat(j.cast("string"), lit(":"),
          col("chunk_text"))) % 1000000L) / lit(1000000.0)).cast("float")))
      .select(col("doc_id"), col("cidx"), col("feat"))
  }

  def maxsimTopDocs(spark: SparkSession, dir: String): DataFrame = {
    // norms are per-CHUNK values — computed once on each side BELOW the
    // cross join instead of inside the per-pair cosine, so each of the
    // |corpus chunks| × |query chunks| pairs evaluates ONE dot product
    // rather than three (Vec.cosine recomputes both norms per pair).
    // sqrt(norm2Sq(x)) here is the exact expression Vec.cosine folds —
    // same fold order, same double — so the per-pair quotient is
    // bitwise the r17 value (the round(4) ranking cannot move).
    val chunks = maxsimChunks(spark, dir)
    val q = chunks.where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("cidx").as("qidx"),
        col("feat").as("q_feat"),
        sqrt(graft.functions.Vec.norm2Sq(col("feat"))).as("nq"))
    val mx = chunks.where(col("doc_id") >= 8)
      .withColumn("nd", sqrt(graft.functions.Vec.norm2Sq(col("feat"))))
      .crossJoin(broadcast(q))
      .groupBy(col("query_id"), col("qidx"), col("doc_id"))
      .agg(max(when(col("nq") === 0.0 || col("nd") === 0.0, lit(0.0))
        .otherwise(graft.functions.Vec.dot(col("q_feat"), col("feat"))
          / (col("nq") * col("nd")))).as("m"))
    val scored = mx.groupBy(col("query_id"), col("doc_id"))
      .agg(round(aggregate(sort_array(collect_list(col("m"))), lit(0.0),
        (a, x) => a + x), 4).as("score"))
    graft.operators.TopNByKey.topN(scored, Seq("query_id"),
        col("score"), col("doc_id"), n = 5, asc = false)
      .select(col("query_id"), col("rk").cast("long").as("rank"),
        col("id").as("doc_id"), col("ord").as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The chunk/feature CTE chain (t, c, ch, f) reconstructing
    * [[maxsimChunks]]'s 16-token chunks + md5 stub features in DuckDB —
    * ONE definition shared by the exact-MaxSim oracle, the
    * approximate-MaxSim oracle, and the hybrid/rerank oracle chain, so
    * the stub-encoder SQL cannot drift between them. `docRestriction`
    * is appended to the documents scan (e.g. a candidate-id filter).
    */
  private def chunkFeatureCtes(docRestriction: String = ""): String =
    s"""t AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
       |  FROM documents$docRestriction),
       |c AS (
       |  SELECT doc_id, ts, unnest(range(0, CASE WHEN len(ts) <= 16 THEN 1
       |    ELSE CAST((len(ts) - 16 + 15) // 16 AS INT) + 1 END)) AS cidx
       |  FROM t),
       |ch AS (
       |  SELECT doc_id, cidx,
       |    coalesce(list_aggregate(list_slice(ts, cidx * 16 + 1,
       |      least(cidx * 16 + 16, len(ts))), 'string_agg', ' '), '') AS chunk_text
       |  FROM c),
       |f AS (
       |  SELECT doc_id, cidx,
       |    list_transform(range(0, 16), j ->
       |      CAST((CAST(('0x' || substr(md5(j || ':' || chunk_text), 1, 15)) AS BIGINT)
       |            % 1000000) / 1000000.0 AS FLOAT)) AS feat
       |  FROM ch)""".stripMargin

  // Same round(4)-then-(score DESC, doc_id) tie contract as BM25 —
  // RetrievalSpec's constructed collision gates this path too.
  private val maxsimTopDocsSql =
    s"""WITH ${chunkFeatureCtes()},
      |p AS (
      |  SELECT q.doc_id AS query_id, q.cidx AS qidx, d.doc_id,
      |    list_reduce(list_transform(list_zip(q.feat, d.feat),
      |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y) AS dp,
      |    sqrt(list_reduce(list_transform(q.feat,
      |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nq,
      |    sqrt(list_reduce(list_transform(d.feat,
      |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nd
      |  FROM f q JOIN f d ON q.doc_id < 8 AND d.doc_id >= 8),
      |mx AS (
      |  SELECT query_id, qidx, doc_id,
      |    max(CASE WHEN nq = 0 OR nd = 0 THEN 0E0 ELSE dp / (nq * nd) END) AS m
      |  FROM p GROUP BY 1, 2, 3),
      |s AS (
      |  SELECT query_id, doc_id,
      |    round(list_reduce(list_sort(list(m)), (a, b) -> a + b), 4) AS score
      |  FROM mx GROUP BY 1, 2),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      |      FROM s)
      |SELECT query_id, rank, doc_id, score
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** The query-side chunk view shared by the approximate-MaxSim catalog
    * query and its oracle generator: docs 0-7 as queries, relabeled to
    * the [[graft.operators.MaxSim]] operator contract.
    */
  private def maxsimQueryChunks(spark: SparkSession, dir: String): DataFrame =
    maxsimChunks(spark, dir).where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("cidx").as("qidx"),
        col("feat").as("q_feat"))

  /** The query batch's pooled vectors — driver-sized by contract (8
    * fixture docs) and memoized per (JVM, data version) like
    * [[bm25QueryPairs]]: four consumers (approximate MaxSim, the
    * hybrid vector arm, and their two oracle generators) each ran the
    * pool+collect driver job per call without it.
    */
  private val msQueryPooledCache =
    new Tables.DataKeyedMemo[Array[(Long, Array[Float])]]()

  private def maxsimQueryPooled(spark: SparkSession,
      dir: String): Array[(Long, Array[Float])] =
    msQueryPooledCache.get(dir) {
      graft.operators.MaxSim.pooledQueryBatch(
        maxsimQueryChunks(spark, dir), MsDim)
    }

  /** Bucketed pooled chunk table, built ONCE per (JVM, sfDir) and
    * persisted to the per-pid cache dir — the same build-once
    * treatment as the IVF index and the MinHash verified pairs: the
    * corpus-wide chunk-featurize + pooling + LSH-signature pass is the
    * INDEX BUILD of the approximate-MaxSim path, paid at build time
    * and amortized over query batches. Written bucket-clustered so a
    * probed-bucket `isin` skips row groups. Returns (parquet path,
    * nBits) — the hyperplanes re-derive from (dim, nBits, seed).
    */
  private val maxsimPoolCache = new Tables.DataKeyedMemo[(String, Int)]()

  def maxsimPool(spark: SparkSession, dir: String): (String, Int) =
    maxsimPoolCache.get(dir) {
      val nDocs = Tables.documents(spark, dir).where(col("doc_id") >= 8).count()
      val nBits = graft.operators.LshAnn.suggestBits(nDocs)
      val planes = graft.operators.LshAnn.hyperplanes(MsDim, nBits, MsSeed)
      val pool = graft.operators.MaxSim.pooled(
        maxsimChunks(spark, dir).where(col("doc_id") >= 8), "doc_id", MsDim)
      val path = s"/tmp/graft_index/${Tables.cacheDirName(dir)}/maxsim_pool"
      graft.operators.LshAnn.bucketed(pool, "doc_id", "pooled", planes)
        .sortWithinPartitions(col("bucket"))
        .write.mode("overwrite").parquet(path)
      (path, nBits)
    }

  /** Approximate MaxSim (the scale path — VERDICT r5 next-round #2):
    * LSH over mean-pooled chunk embeddings generates top-20 candidate
    * docs per query, exact chunk-level MaxSim re-ranks only those.
    * [[maxsimTopDocs]] stays the exact contract; this entry is the plan
    * a 100 TB corpus actually runs — no all-corpus-chunks NLJ, and the
    * corpus pass lives in the [[maxsimPool]] build, not in the query.
    */
  def maxsimAnnTopDocs(spark: SparkSession, dir: String): DataFrame = {
    val (path, nBits) = maxsimPool(spark, dir)
    graft.operators.MaxSim.annTopDocsFromBuckets(
      maxsimQueryChunks(spark, dir),
      maxsimChunks(spark, dir).where(col("doc_id") >= 8),
      spark.read.parquet(path),
      graft.operators.LshAnn.hyperplanes(MsDim, nBits, MsSeed),
      dim = MsDim, k = 5, perQuery = MsPerQuery, nProbeBits = MsProbeBits,
      qPooled = Some(maxsimQueryPooled(spark, dir)))
  }

  /** Approximate-MaxSim oracle: the engine's candidate pairs are
    * inlined (they depend on seeded LSH buckets + pooled-cosine
    * ranking); DuckDB recomputes the chunking, the md5 pseudo-features,
    * and the full MaxSim scoring + ranking restricted to those pairs —
    * the same independence split as the LSH/IVF probe oracles.
    */
  private def maxsimAnnTopDocsOracle(spark: SparkSession, dir: String): String = {
    val (path, nBits) = maxsimPool(spark, dir)
    val pairs = graft.operators.MaxSim.candidatesFromBuckets(
        maxsimQueryChunks(spark, dir),
        spark.read.parquet(path),
        graft.operators.LshAnn.hyperplanes(MsDim, nBits, MsSeed),
        dim = MsDim, perQuery = MsPerQuery, nProbeBits = MsProbeBits,
        qPooled = Some(maxsimQueryPooled(spark, dir)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val vals = OracleGen.lits(pairs.toSeq.map { case (q, d) => s"($q,$d)" })
    s"""WITH cand(query_id, doc_id) AS (VALUES $vals),
       |${chunkFeatureCtes()},
       |p AS (
       |  SELECT cd.query_id, q.cidx AS qidx, cd.doc_id,
       |    list_reduce(list_transform(list_zip(q.feat, d.feat),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y) AS dp,
       |    sqrt(list_reduce(list_transform(q.feat,
       |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nq,
       |    sqrt(list_reduce(list_transform(d.feat,
       |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nd
       |  FROM cand cd
       |  JOIN f q ON q.doc_id = cd.query_id
       |  JOIN f d ON d.doc_id = cd.doc_id),
       |mx AS (
       |  SELECT query_id, qidx, doc_id,
       |    max(CASE WHEN nq = 0 OR nd = 0 THEN 0E0 ELSE dp / (nq * nd) END) AS m
       |  FROM p GROUP BY 1, 2, 3),
       |s AS (
       |  SELECT query_id, doc_id,
       |    round(list_reduce(list_sort(list(m)), (a, b) -> a + b), 4) AS score
       |  FROM mx GROUP BY 1, 2),
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |      FROM s)
       |SELECT query_id, rank, doc_id, score
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke &
    * Buettcher 2009): fuse a lexical arm (BM25 top-20 from the
    * amortized posting table) with a vector arm (pooled-embedding LSH
    * candidates, the [[maxsimAnnTopDocs]] first stage) by
    * rrf(d) = Σ_arms 1/(60 + rank_arm(d)) — the standard production
    * combo for RAG corpus search and retrieval-based decontamination,
    * where each arm catches what the other misses (lexical: rare
    * identifiers; vector: paraphrase).
    *
    * Scale shape: BOTH arms serve from build-once artifacts
    * ([[bm25Index]] postings, [[maxsimPool]] bucketed pooled vectors) —
    * query cost is matched postings + probed buckets, never a corpus
    * scan. The fusion itself is rank arithmetic over ≤40 rows per
    * query: contributions are exact IEEE doubles (1/(60+r) with integer
    * r), folded sorted and round(6)ed BEFORE the final ranking, ties by
    * doc_id — bitwise reproducible in DuckDB.
    */
  /** The fused (query_id, doc_id, rrf_score) table — shared by the
    * hybrid top-k and the cross-encoder re-rank's candidate stage.
    */
  private[graft] def hybridRrfFused(spark: SparkSession, dir: String): DataFrame = {
    val bmTop = graft.operators.TopNByKey.topN(bm25Scored(spark, dir),
        Seq("query_id"), col("score"), col("doc_id"), n = 20, asc = false)
      .select(col("query_id"), col("id").as("doc_id"), col("rk"))
    val (path, nBits) = maxsimPool(spark, dir)
    val vecTop = graft.operators.MaxSim.rankedCandidatesFromBuckets(
      maxsimQueryChunks(spark, dir), spark.read.parquet(path),
      graft.operators.LshAnn.hyperplanes(MsDim, nBits, MsSeed),
      dim = MsDim, perQuery = MsPerQuery, nProbeBits = MsProbeBits,
      qPooledPre = Some(maxsimQueryPooled(spark, dir)))
    graft.operators.Rrf.fuse(Seq(bmTop, vecTop))
  }

  /** Hard bound on the fused artifact's driver copy: both arms emit a
    * top-N cut per query doc (20 lexical + [[MsPerQuery]] vector over
    * the 8-doc query batch → ≤320 fused rows), so 1024 holds with
    * margin; a contract change that unbounds an arm fails here by
    * name instead of growing a silent driver transfer.
    */
  private val MaxFusedRows = 1024

  /** The fused (query_id, doc_id, rrf_score) table, computed ONCE per
    * (JVM, data version) and served as a local relation thereafter —
    * the retrieval stage's output artifact that every downstream
    * consumer (hybrid top-k, cross-encoder candidate cut) reads
    * without re-running the arms. This is the production serving
    * shape: arm recomputation scales with the query batch and happens
    * once per corpus version; fusion consumers do rank arithmetic over
    * ≤ queries×40 rows. Cold cost is unchanged (the first caller pays
    * both arms); warm consumers skip the posting/pool scans entirely
    * (PlanSpec pins the served plan to a LocalTableScan with zero
    * FileScans).
    */
  private val hybridFusedCache = new Tables.DataKeyedMemo[
    (org.apache.spark.sql.types.StructType,
      Array[org.apache.spark.sql.Row])]()

  private[graft] def hybridRrfServed(spark: SparkSession, dir: String): DataFrame = {
    val (schema, rows) =
      hybridFusedCache.get(dir) {
        val df = hybridRrfFused(spark, dir)
        val collected = df.limit(MaxFusedRows + 1).collect()
        require(collected.length <= MaxFusedRows,
          s"hybridRrfServed: fused artifact exceeds $MaxFusedRows rows " +
            "- an arm's per-query cut is no longer bounded; fix the arm " +
            "or raise MaxFusedRows deliberately")
        (df.schema, collected)
      }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  def hybridRrfTopDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Rrf.topDocs(hybridRrfServed(spark, dir), k = 5)

  /** Hybrid-RRF oracle: only the vector arm's candidate SET is inlined
    * (it depends on seeded LSH buckets); DuckDB independently recomputes
    * the pooled embeddings from text, the pooled cosines AND their ranks
    * (round(6)-before-rank makes the ranks float-reproducible; ranking
    * the kept top-20 among themselves preserves the 1..20 ranks), the
    * whole BM25 arm from scratch via the shared [[bm25ScoredCtes]], and
    * the fusion arithmetic.
    */
  /** The generated CTE chain through fused(query_id, doc_id,
    * rrf_score) — shared by the hybrid-RRF oracle and the
    * cross-encoder re-rank oracle so the candidate recomputation
    * cannot drift between them.
    */
  private def hybridFusedCtes(spark: SparkSession, dir: String): String = {
    val (path, nBits) = maxsimPool(spark, dir)
    val pairs = graft.operators.MaxSim.candidatesFromBuckets(
        maxsimQueryChunks(spark, dir), spark.read.parquet(path),
        graft.operators.LshAnn.hyperplanes(MsDim, nBits, MsSeed),
        dim = MsDim, perQuery = MsPerQuery, nProbeBits = MsProbeBits,
        qPooled = Some(maxsimQueryPooled(spark, dir)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val vals = OracleGen.lits(pairs.toSeq.map { case (q, d) => s"($q,$d)" })
    s"""cand(query_id, doc_id) AS (VALUES $vals),
       |${chunkFeatureCtes(
            "\n  WHERE doc_id < 8 OR doc_id IN (SELECT doc_id FROM cand)")},
       |pl AS (
       |  SELECT doc_id, list(feat ORDER BY cidx) AS fl, count(*) AS n
       |  FROM f GROUP BY doc_id),
       |pooled AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 16), j ->
       |      CAST(list_reduce(list_transform(fl, v -> CAST(v[j + 1] AS DOUBLE)),
       |        (a, b) -> a + b) / n AS FLOAT)) AS p
       |  FROM pl),
       |vc AS (
       |  SELECT x.query_id, x.doc_id,
       |    round(CASE WHEN nq = 0 OR nd = 0 THEN 0E0
       |               ELSE dp / (nq * nd) END, 6) AS pc
       |  FROM (
       |    SELECT cd.query_id, cd.doc_id,
       |      list_reduce(list_transform(list_zip(q.p, d.p),
       |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y) AS dp,
       |      sqrt(list_reduce(list_transform(q.p,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nq,
       |      sqrt(list_reduce(list_transform(d.p,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)) AS nd
       |    FROM cand cd
       |    JOIN pooled q ON q.doc_id = cd.query_id
       |    JOIN pooled d ON d.doc_id = cd.doc_id) x),
       |vecr AS (
       |  SELECT query_id, doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY pc DESC, doc_id) AS vrank
       |  FROM vc),
       |$bm25ScoredCtes,
       |bmr AS (
       |  SELECT query_id, doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS brank
       |  FROM scored),
       |arms AS (
       |  SELECT query_id, doc_id, 1E0 / (60E0 + vrank) AS c FROM vecr
       |  UNION ALL
       |  SELECT query_id, doc_id, 1E0 / (60E0 + brank) AS c
       |  FROM bmr WHERE brank <= 20),
       |fused AS (
       |  SELECT query_id, doc_id,
       |    round(list_reduce(list_sort(list(c)), (a, b) -> a + b), 6) AS rrf_score
       |  FROM arms GROUP BY 1, 2)""".stripMargin
  }

  private def hybridRrfOracle(spark: SparkSession, dir: String): String =
    s"""WITH ${hybridFusedCtes(spark, dir)},
       |r AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
       |      FROM fused)
       |SELECT query_id, rank, doc_id, rrf_score
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Cross-encoder re-ranking over the hybrid candidates — the final
    * stage of the production retrieval stack (retrieve with cheap
    * arms, re-rank the short list with an expensive pairwise model,
    * e.g. monoBERT / MiniLM cross-encoders): hybrid-RRF top-20 per
    * query → score each (query, doc) PAIR jointly → top-5. The
    * pairwise kernel is a STUB in the repo's multimodal-encoder
    * convention — a real interaction signal (distinct-token overlap
    * ratio, the relevance part) plus an md5-derived epsilon ≤ 1e-3
    * standing in for the learned component — so the Spark-side
    * plumbing (bounded candidate collect, isin-pruned pair-text scan,
    * broadcast pair join, round-before-rank) is real and
    * oracle-checkable end to end; a real model replaces exactly the
    * `ce` expression.
    *
    * Scale shape: the candidate list is driver-sized by contract
    * (queries × 20, the MaxSim.rerank treatment), so pair texts come
    * from an isin-PRUNED documents scan joined against the broadcast
    * pair table — per query batch the corpus contributes only the
    * candidate docs, never a scan.
    */
  def rerankCrossTopDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CrossEncoder.rerank(spark,
      Tables.documents(spark, dir).where(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"),
          tokens(lower(col("text"))).as("terms")),
      Tables.documents(spark, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("terms")),
      hybridCandidatePairs(spark, dir), k = 5)

  /** The fused top-20 candidate (query_id, doc_id) pairs — the
    * retrieval stage's OUTPUT, which the re-ranker consumes as an
    * upstream artifact (production re-rankers never recompute the
    * arms). Driver-sized by contract (queries × 20) and memoized per
    * (JVM, data version) like [[bm25QueryPairs]]: without the memo
    * every rerank call re-ran both retrieval arms + fusion just to
    * rebuild a list the hybrid query had already computed.
    */
  private val rerankPairCache = new Tables.DataKeyedMemo[Array[(Long, Long)]]()

  private def hybridCandidatePairs(spark: SparkSession, dir: String): Array[(Long, Long)] =
    rerankPairCache.get(dir) {
      // cut from the served fused artifact (hybridRrfServed) so the
      // arms run at most once per (JVM, data version) across BOTH the
      // hybrid query and the re-ranker, whichever runs first
      graft.operators.TopNByKey.topN(hybridRrfServed(spark, dir),
          Seq("query_id"), col("rrf_score"), col("doc_id"), n = 20,
          asc = false)
        .select(col("query_id"), col("id").as("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }

  /** Re-rank oracle: the SAME generated fused-candidate chain as the
    * hybrid oracle (only the seeded LSH candidate SET inlined), then
    * DuckDB independently recomputes the top-20 cut, the pair token
    * sets, the overlap ratio, the md5 epsilon, and the final ranking.
    */
  private def rerankCrossOracle(spark: SparkSession, dir: String): String =
    s"""WITH ${hybridFusedCtes(spark, dir)},
       |hr AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS rank
       |    FROM fused) WHERE rank <= 20),
       |qt AS (
       |  SELECT doc_id AS query_id,
       |    list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '')) AS qts
       |  FROM documents WHERE doc_id < 8),
       |dt AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '')) AS dts
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM hr)),
       |ce AS (
       |  SELECT h.query_id, h.doc_id,
       |    round(CAST(len(list_intersect(q.qts, d.dts)) AS DOUBLE)
       |        / greatest(len(q.qts), 1)
       |      + (CAST(('0x' || substr(md5(h.query_id || ':' || h.doc_id), 1, 15))
       |           AS BIGINT) % 1000000) / 1E9, 6) AS ce_score
       |  FROM hr h JOIN qt q USING (query_id) JOIN dt d USING (doc_id)),
       |r2 AS (SELECT *, ROW_NUMBER() OVER (
       |         PARTITION BY query_id ORDER BY ce_score DESC, doc_id) AS rank
       |       FROM ce)
       |SELECT query_id, rank, doc_id, ce_score
       |FROM r2 WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Training-batch length audit: power-of-2 token-length buckets
    * (16…2048, open-topped at 4096) with the padding waste a
    * fixed-shape batcher would pay per (source, bucket) — the
    * sequence-length efficiency scan run before choosing a packing or
    * bucketing strategy (the waste this measures is what
    * [[QualityQueries.packSequences]] eliminates). Bucket assignment
    * is an integer CASE chain (no float log2 — bitwise-identical
    * cross-engine by construction), map-side, followed by one tiny
    * groupBy; integers end to end with a single final division.
    */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val n = size(tokens(col("text")))
    val bucket = Seq(16, 32, 64, 128, 256, 512, 1024, 2048)
      .foldRight(lit(4096).cast("long"))((b, acc) =>
        when(n <= b, lit(b).cast("long")).otherwise(acc))
    Tables.documents(spark, dir)
      .select(col("source"), n.as("n_tokens"), bucket.as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("padding_tokens",
        col("bucket") * col("n_docs") - col("total_tokens"))
      .withColumn("waste_ratio",
        round(col("padding_tokens").cast("double")
          / (col("bucket") * col("n_docs")), 4))
      .orderBy(col("source"), col("bucket"))
  }

  private val lengthBucketsSql =
    """WITH t AS (
      |  SELECT source,
      |    len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT source, n_tokens,
      |    CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
      |         WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
      |         WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
      |         WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048
      |         ELSE 4096 END AS bucket
      |  FROM t),
      |g AS (
      |  SELECT source, bucket, count(*) AS n_docs,
      |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      |  FROM b GROUP BY 1, 2)
      |SELECT source, bucket, n_docs, total_tokens,
      |  bucket * n_docs - total_tokens AS padding_tokens,
      |  round(CAST(bucket * n_docs - total_tokens AS DOUBLE)
      |    / (bucket * n_docs), 4) AS waste_ratio
      |FROM g ORDER BY source, bucket""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "bm25_top_docs" -> QueryDef(bm25TopDocs, Some(bm25TopDocsSql)),
    "maxsim_top_docs" -> QueryDef(maxsimTopDocs, Some(maxsimTopDocsSql)),
    "maxsim_ann_top_docs" -> QueryDef(maxsimAnnTopDocs,
      OracleGen.sql("maxsim_ann_top_docs")(maxsimAnnTopDocsOracle)),
    "hybrid_rrf_top_docs" -> QueryDef(hybridRrfTopDocs,
      OracleGen.sql("hybrid_rrf_top_docs")(hybridRrfOracle)),
    "rerank_cross_top_docs" -> QueryDef(rerankCrossTopDocs,
      OracleGen.sql("rerank_cross_top_docs")(rerankCrossOracle)),
    "length_buckets" -> QueryDef(lengthBuckets, Some(lengthBucketsSql)),
    "bpe_merges" -> QueryDef(bpeMerges, Some(bpeMergesSql)),
    "bpe_token_stats" -> QueryDef(bpeTokenStats,
      OracleGen.sql("bpe_token_stats")(bpeTokenStatsOracle)),
    "bigram_lm_top" -> QueryDef(bigramLmTop, Some(bigramLmTopSql)),
    "doc_logprob_score" -> QueryDef(logprobScore, Some(logprobScoreSql)),
    "hashed_tf" -> QueryDef(hashedTf, Some(hashedTfSql)),
    "tfidf_top_terms" -> QueryDef(tfidfTopTerms, Some(tfidfTopTermsSql)),
    "docs_hash_sample" -> QueryDef(hashSampleDocs, Some(hashSampleDocsSql)),
    "docs_stratified_sample" -> QueryDef(stratifiedSampleCounts, Some(stratifiedSampleCountsSql)),
    "docs_weighted_sample" -> QueryDef(weightedSampleDocs, Some(weightedSampleDocsSql)),
    "token_count_bpe" -> QueryDef(tokenCountBpe, Some(tokenCountBpeSql)),
    "doc_winnow_fingerprints" -> QueryDef(winnowFingerprints, Some(winnowFingerprintsSql)),
    "doc_stats" -> QueryDef(docStats, Some(docStatsSql)),
    "lang_source_stats" -> QueryDef(langSourceStats, Some(langSourceStatsSql)),
    "token_frequency" -> QueryDef(tokenFrequency, Some(tokenFrequencySql)),
    "cms_token_counts" -> QueryDef(cmsTokenCounts, Some(cmsTokenCountsSql)),
    "cms_heavy_hitters" -> QueryDef(cmsHeavyHitters, Some(cmsHeavyHittersSql)),
    "sparse_cosine_pairs" -> QueryDef(sparseCosinePairs, Some(sparseCosinePairsSql)),
    "quality_score" -> QueryDef(qualityScore, Some(qualityScoreSql)),
    "language_id" -> QueryDef(languageId, Some(languageIdSql)),
    "doc_fingerprints" -> QueryDef(fingerprints, Some(fingerprintsSql))
  )
}
