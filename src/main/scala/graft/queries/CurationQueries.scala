package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.TextQueries.tokens
import graft.queries.DedupQueries.md5Long

/** Document-curation operators a production training-data pipeline runs
  * before anything touches a tokenizer: PII detection/redaction,
  * rule-based filtering (Gopher/C4-style bounds), and DSIR-style
  * importance weighting for data selection.
  *
  * Scale shape: every operator here is a map-side projection over the
  * corpus followed by one bounded aggregation — no joins against the
  * corpus, no shuffle wider than the (tiny) output. The DSIR weights
  * need two unigram LMs; both are integer bucket-count aggregates of a
  * few KB (1024 buckets) that broadcast back, so the per-doc scoring
  * pass stays map-side at 100 TB.
  */
object CurationQueries {

  // ---------------------------------------------------------------- PII

  /** PII regexes, identical semantics in java.util.regex and RE2 (DuckDB):
    * character classes, bounded repeats and \b only — no lookaround.
    * Order matters for redaction: email before phone so an address's
    * digits are not phone-matched; ipv4/id before phone for the same
    * reason.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("id_number", "\\b[0-9]{13,16}\\b", "<ID>"),
    ("phone", "\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"))

  /** Redacted form of a text column: every PII match replaced by its
    * type token. Pure regexp_replace chain — map-side, codegen.
    */
  def redactPii(c: Column): Column =
    PiiPatterns.foldLeft(c) { case (acc, (_, pat, token)) =>
      regexp_replace(acc, pat, token)
    }

  /** Corpus PII scan: matches and affected docs per PII type. One pass:
    * per-row counts for all types are computed in a single projection
    * and exploded into (pii_type, n) rows before a 4-group aggregation.
    * (On the synthetic corpus every count is zero — the oracle still
    * verifies the full pipeline; detection behavior is unit-tested on
    * constructed strings in CurationSpec.)
    */
  def piiScanStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(array(
        PiiPatterns.map { case (name, pat, _) =>
          // greatest(..., 0): size(NULL) is -1 (legacy sizeOfNull), which
          // would DECREMENT the corpus total once per null-text row while
          // the oracle's sum() skips NULLs
          struct(lit(name).as("pii_type"),
            greatest(size(regexp_extract_all(col("text"), lit(pat), lit(0))),
              lit(0)).as("n"))
        }: _*)).as("p"))
      .select(col("p.pii_type").as("pii_type"), col("p.n").as("n"))
      .groupBy(col("pii_type"))
      .agg(sum(col("n")).cast("long").as("n_matches"),
        sum(when(col("n") > 0, 1).otherwise(0)).cast("long").as("n_docs_with"))
      .orderBy(col("pii_type"))

  private val piiScanStatsSql = {
    val per = PiiPatterns.map { case (name, pat, _) =>
      s"SELECT '$name' AS pii_type, len(regexp_extract_all(text, '$pat')) AS n FROM documents"
    }.mkString("\n      UNION ALL ")
    s"""WITH per AS (
       |  $per)
       |SELECT pii_type, CAST(sum(n) AS BIGINT) AS n_matches,
       |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with
       |FROM per GROUP BY pii_type ORDER BY pii_type""".stripMargin
  }

  /** PII redaction as a catalog transform (doc_id < 100 slice): the
    * [[redactPii]] regexp_replace chain applied per doc, reported as
    * before/after lengths + changed flag + a bounded redacted SUFFIX.
    * The synthetic corpus contains no PII (piiScanStats measures zero
    * matches), so redacting raw text would be an identity transform in
    * BOTH engines and a broken pattern/token/fold-order would stay
    * oracle-green; instead each doc gets a deterministic planted-PII
    * footer (email + IP derived from doc_id, built identically in both
    * engines) so every row exercises real replacement and the hash
    * compare genuinely gates the replace path. Map-side projection —
    * no shuffle at any scale; detection behavior on constructed
    * strings is CurationSpec's job.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).where(col("doc_id") < 100)
      .withColumn("salted",
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com ip 10.0."), col("doc_id"), lit(".7")))
      .withColumn("redacted", redactPii(col("salted")))
      .select(col("doc_id"),
        length(col("salted")).cast("long").as("len_before"),
        length(col("redacted")).cast("long").as("len_after"),
        when(col("salted") =!= col("redacted"), 1L).otherwise(0L).as("changed"),
        // tail via the same CASE the SQL twin uses — Spark's negative
        // substring start and DuckDB's disagree on short strings
        when(length(col("redacted")) <= 48, col("redacted"))
          .otherwise(expr("substring(redacted, length(redacted) - 47, 48)"))
          .as("redacted_tail"))
      .orderBy(col("doc_id"))

  private val piiRedactSql = {
    val redacted = PiiPatterns.foldLeft("salted") { case (acc, (_, pat, token)) =>
      s"regexp_replace($acc, '$pat', '$token', 'g')"
    }
    s"""WITH s AS (
       |  SELECT doc_id,
       |    text || ' contact: user' || doc_id || '@example.com ip 10.0.' || doc_id || '.7' AS salted
       |  FROM documents WHERE doc_id < 100),
       |r AS (SELECT doc_id, salted, $redacted AS redacted FROM s)
       |SELECT doc_id,
       |  CAST(length(salted) AS BIGINT) AS len_before,
       |  CAST(length(redacted) AS BIGINT) AS len_after,
       |  CAST(CASE WHEN salted <> redacted THEN 1 ELSE 0 END AS BIGINT) AS changed,
       |  CASE WHEN length(redacted) <= 48 THEN redacted
       |       ELSE substr(redacted, length(redacted) - 47, 48) END AS redacted_tail
       |FROM r ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------- rule-based filter

  /** Gopher-style stop list (the 8-word variant from Rae et al. 2021). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Rule-based document filter (Gopher/C4-flavored bounds adapted to a
    * whitespace corpus), reported as per-rule violation counts plus the
    * corpus total and the count passing EVERY rule. All six rules are
    * computed from the token array in one map-side projection; the
    * aggregation is a single row that is then unpivoted — integer
    * counts end to end, so the oracle matches bitwise.
    */
  def ruleFilterStats(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(StopWords.map(lit): _*)
    val flags = Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      .select(
        (size(col("toks")) < 50).as("too_few_words"),
        (size(col("toks")) > 100000).as("too_many_words"),
        {
          val mean = aggregate(col("toks"), lit(0.0), (a, t) => a + length(t))
            .divide(greatest(size(col("toks")), lit(1)))
          (mean < 3.0 || mean > 10.0).as("mean_word_len_out_of_range")
        },
        (size(array_intersect(array_distinct(col("toks")), stopArr)) < 2)
          .as("too_few_stopwords"),
        (array_max(transform(col("toks"), t => length(t))) > 20)
          .as("word_too_long"),
        (size(filter(col("toks"), t => t.rlike("^[0-9]+$"))).cast("double")
          / greatest(size(col("toks")), lit(1)) > 0.5).as("digit_heavy"))
    val ruleCols = Seq("too_few_words", "too_many_words",
      "mean_word_len_out_of_range", "too_few_stopwords", "word_too_long",
      "digit_heavy")
    val aggCols: Seq[Column] =
      count(lit(1)).as("docs_total") +:
        sum(when(ruleCols.map(col).reduce(_ || _), 0).otherwise(1))
          .cast("long").as("kept_all") +:
        ruleCols.map(r => sum(when(col(r), 1).otherwise(0)).cast("long").as(r))
    val agg = flags.agg(aggCols.head, aggCols.tail: _*)
    val stackExpr = (ruleCols ++ Seq("docs_total", "kept_all"))
      .map(r => s"'$r', $r").mkString(", ")
    agg.selectExpr(s"stack(${ruleCols.size + 2}, $stackExpr) AS (rule, n_docs)")
      .orderBy(col("rule"))
  }

  private val ruleFilterStatsSql =
    """WITH f AS (
      |  SELECT
      |    len(t) < 50 AS too_few_words,
      |    len(t) > 100000 AS too_many_words,
      |    CASE WHEN len(t) = 0 THEN 0.0
      |         ELSE list_reduce(list_transform(t, x -> CAST(length(x) AS DOUBLE)), (a, b) -> a + b)
      |      END / greatest(len(t), 1) NOT BETWEEN 3.0 AND 10.0 AS mean_word_len_out_of_range,
      |    len(list_intersect(list_distinct(t),
      |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) < 2 AS too_few_stopwords,
      |    list_max(list_transform(t, x -> length(x))) > 20 AS word_too_long,
      |    CAST(len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$'))) AS DOUBLE)
      |      / greatest(len(t), 1) > 0.5 AS digit_heavy
      |  FROM (SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      |        FROM documents)),
      |s AS (
      |  SELECT count(*) AS docs_total,
      |    CAST(sum(CASE WHEN too_few_words OR too_many_words
      |      OR mean_word_len_out_of_range OR too_few_stopwords
      |      OR word_too_long OR digit_heavy THEN 0 ELSE 1 END) AS BIGINT) AS kept_all,
      |    CAST(sum(CASE WHEN too_few_words THEN 1 ELSE 0 END) AS BIGINT) AS too_few_words,
      |    CAST(sum(CASE WHEN too_many_words THEN 1 ELSE 0 END) AS BIGINT) AS too_many_words,
      |    CAST(sum(CASE WHEN mean_word_len_out_of_range THEN 1 ELSE 0 END) AS BIGINT) AS mean_word_len_out_of_range,
      |    CAST(sum(CASE WHEN too_few_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS too_few_stopwords,
      |    CAST(sum(CASE WHEN word_too_long THEN 1 ELSE 0 END) AS BIGINT) AS word_too_long,
      |    CAST(sum(CASE WHEN digit_heavy THEN 1 ELSE 0 END) AS BIGINT) AS digit_heavy
      |  FROM f)
      |SELECT rule, n_docs FROM (
      |  SELECT 'too_few_words' AS rule, too_few_words AS n_docs FROM s
      |  UNION ALL SELECT 'too_many_words', too_many_words FROM s
      |  UNION ALL SELECT 'mean_word_len_out_of_range', mean_word_len_out_of_range FROM s
      |  UNION ALL SELECT 'too_few_stopwords', too_few_stopwords FROM s
      |  UNION ALL SELECT 'word_too_long', word_too_long FROM s
      |  UNION ALL SELECT 'digit_heavy', digit_heavy FROM s
      |  UNION ALL SELECT 'docs_total', docs_total FROM s
      |  UNION ALL SELECT 'kept_all', kept_all FROM s)
      |ORDER BY rule""".stripMargin

  // ---------------------------------------------------------- chunking

  /** Sliding-window document chunking — the context-window splitter a
    * pretraining/RAG pipeline runs before tokenization budgeting:
    * windows of `window` tokens advancing by `stride` (overlap =
    * window − stride), last window truncated, every doc yields at least
    * one chunk. Pure integer arithmetic + array slices, map-side, one
    * explode; chunk identity is the md5 of the re-joined token span so
    * downstream chunk-level dedup composes with the existing
    * fingerprint operators.
    */
  def chunkDocs(spark: SparkSession, dir: String, window: Int = 64,
      stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"bad chunking: window=$window stride=$stride")
    val n = size(col("toks"))
    // ceil((n - window) / stride) + 1, in integer math, min 1
    val nChunks = when(n <= window, lit(1))
      .otherwise((n - window + stride - 1).divide(stride).cast("int") + 1)
    Tables.documents(spark, dir)
      .where(col("doc_id") < 30)
      .withColumn("toks", tokens(col("text")))
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(window))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkDocsSql =
    """WITH t AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 30),
      |c AS (
      |  SELECT doc_id, toks,
      |    unnest(range(0, CASE WHEN len(toks) <= 64 THEN 1
      |      ELSE CAST((len(toks) - 64 + 47) // 48 AS INT) + 1 END)) AS chunk_idx
      |  FROM t),
      |s AS (
      |  SELECT doc_id, chunk_idx,
      |    list_slice(toks, chunk_idx * 48 + 1,
      |      least(chunk_idx * 48 + 64, len(toks))) AS chunk
      |  FROM c)
      |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS chunk_tokens,
      |  md5(coalesce(list_aggregate(chunk, 'string_agg', ' '), '')) AS chunk_md5
      |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------------- DSIR weights

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each doc by
    * log p_target(doc) − log p_raw(doc) under two hashed-unigram bag
    * models — target = the English subset, raw = the full corpus.
    * Buckets are md5-hashed (1024-way, oracle-reproducible); both LMs
    * are +1-smoothed integer bucket counts. Per-doc sums fold in sorted
    * order so the float result is engine- and partitioning-independent
    * (same discipline as doc_logprob_score).
    *
    * Scale shape: the two LMs are 1024-row aggregates (broadcast); the
    * scoring pass is tokenize → bucket → join-with-broadcast → one
    * per-doc aggregation. Nothing corpus-sized shuffles except the
    * (doc_id, token-bucket) explode, which map-side combines.
    */
  /** The hash modulus AND the +1-smoothing vocabulary size — the two
    * must stay equal (smoothing assumes one pseudo-count per possible
    * bucket), so there is exactly one definition.
    */
  private val DsirBuckets = 1024

  private def dsirTokStream(df: DataFrame): DataFrame = df
    .select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("token"))
    .withColumn("bucket", pmod(md5Long(col("token")), lit(DsirBuckets)))

  private val dsirLmCache = new Tables.DataKeyedMemo[Seq[(Long, Double)]]()

  /** The two hashed-unigram LMs (target = English subset, raw = full
    * corpus) distilled to per-bucket log-weights, trained ONCE per
    * (JVM, sfDir) — in DSIR the LMs are fit once over the corpus and
    * reused to score every document, so the corpus-wide tokenize +
    * bucket-count pass is this path's INDEX BUILD (`dsir_lm_build`
    * bench entry, the bm25Index treatment). 1024 rows — kept
    * driver-side and broadcast to scoring queries.
    */
  def dsirLm(spark: SparkSession, dir: String): Seq[(Long, Double)] =
    dsirLmCache.get(dir)(buildDsirLm(spark, dir))

  /** The uncached LM build — separate so CurationSpec can gate the
    * build's partitioning independence directly (the memoized form
    * would make a second call a tautology).
    */
  private[graft] def buildDsirLm(spark: SparkSession,
      d: String): Seq[(Long, Double)] = {
      val buckets = DsirBuckets
      // ONE corpus pass, ONE Spark job (r18): the raw and target LMs
      // are both exact integer re-aggregations of the (bucket, is-en)
      // count table — ≤ 2·DsirBuckets rows, collected driver-side —
      // so the r17 shape (persist the exploded token stream, run four
      // separate driver-blocking actions over it: two groupBys, two
      // grand totals) collapses to a single groupBy + collect. The
      // log-weight arithmetic below evaluates the SAME doubles the DF
      // expressions did ((c+1)/ (total+buckets) division then
      // Math.log), so the LM is bitwise unchanged; spread before the
      // explode+md5 stage as before (identity at cluster scale).
      val bl = dsirTokStream(Tables.spread(Tables.documents(spark, d),
          col("doc_id")))
        // coalesce: a null lang must count in raw and not in target —
        // exactly the old where(lang === "en") null semantics — and
        // must not surface as a null group key
        .groupBy(col("bucket"),
          coalesce(col("lang") === "en", lit(false)).as("en"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      val cr = bl.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val ct = bl.filter(_._2).map(t => t._1 -> t._3).toMap
      val totals = cr.values.sum
      val totalT = ct.values.sum
      cr.toSeq.map { case (bucket, crv) =>
        val ctv = ct.getOrElse(bucket, 0L)
        bucket -> (math.log((ctv + 1).toDouble / (totalT + buckets).toDouble) -
          math.log((crv + 1).toDouble / (totals + buckets).toDouble))
      }.sortBy(_._1)
  }

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // scoring serves from the built LM: one fresh doc_id<100 scan
    // (pushed filter) joined against the broadcast 1024-row LM
    val lm = dsirLm(spark, dir).toDF("bucket", "lw")
    dsirTokStream(Tables.documents(spark, dir).where(col("doc_id") < 100))
      .join(broadcast(lm), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(aggregate(sort_array(collect_list(col("lw"))), lit(0.0),
          (a, x) => a + x), 4).as("dsir_logratio"),
        round(aggregate(sort_array(collect_list(col("lw"))), lit(0.0),
          (a, x) => a + x) / count(lit(1)), 4).as("dsir_per_token"))
      .orderBy(col("doc_id"))
  }

  private val dsirWeightsSql =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(('0x' || substr(md5(unnest(list_filter(regexp_split_to_array(text, '\s+'),
      |      t -> t <> ''))), 1, 15)) AS BIGINT) % 1024 AS bucket
      |  FROM documents),
      |raw AS (SELECT bucket, count(*) AS cr FROM toks GROUP BY bucket),
      |tgt AS (SELECT bucket, count(*) AS ct FROM toks WHERE lang = 'en' GROUP BY bucket),
      |tot AS (SELECT (SELECT sum(cr) FROM raw) AS tr, (SELECT sum(ct) FROM tgt) AS tt),
      |lm AS (
      |  SELECT raw.bucket,
      |    ln(CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE) / (tot.tt + 1024))
      |      - ln(CAST(raw.cr + 1 AS DOUBLE) / (tot.tr + 1024)) AS lw
      |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(list_reduce(list_sort(list(lw)), (a, b) -> a + b), 4) AS dsir_logratio,
      |  round(list_reduce(list_sort(list(lw)), (a, b) -> a + b) / count(*), 4) AS dsir_per_token
      |FROM toks JOIN lm USING (bucket)
      |WHERE doc_id < 100
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------- trained quality filter

  /** The GPT-3-style TRAINED quality classifier
    * ([[graft.operators.LinearClassifier]]): logistic regression on
    * hashed unigram frequencies, target = the English subset (the same
    * target distribution DSIR importance-weights against — the two are
    * the classifier-based and importance-sampling-based versions of one
    * selection recipe). Output: per-language mean score and
    * fraction-kept at the 0.5 threshold — the table a pipeline owner
    * reads to set the filter threshold.
    *
    * Gate: fully oracled via [[OracleGen]] — the 50 float GD iterations
    * are not SQL-expressible, but the trained model is just `dim`
    * doubles + a bias, so the generator inlines the weights the engine
    * trained and DuckDB independently recomputes the SCORING of every
    * document (md5 feature bucketing, L1 tf normalization, the exact
    * ascending-bucket dot-product fold, sigmoid) plus the per-lang
    * rollup. The learning itself — separable data → AUC 1, target ranks
    * above non-target on the corpus, boundary stability across
    * partitionings — is gated in ClassifierSpec.
    */
  /** Classifier trained once per (JVM, sfDir) — shared by the batch
    * stats query and the streaming scoring path (the production shape:
    * train offline, score everywhere).
    */
  private val clfModels =
    new Tables.DataKeyedMemo[graft.operators.LinearClassifier.Model]()

  /** Trained once per (JVM, sfDir) on a BOUNDED deterministic
    * content-hash sample — the 100 TB shape (SCALE.md): a linear probe
    * needs a bounded sample (~2k rows here at test scale; ~10^5 in
    * production — the `cap` constant below is the knob), not the
    * corpus, and the model then scores corpus-wide as a pure map-side
    * pass. The cap keeps training cost constant as the corpus grows;
    * the hash keys the sample to doc identity, so it is reproducible
    * and partitioning-independent.
    */
  def classifierModel(spark: SparkSession,
      dir: String): graft.operators.LinearClassifier.Model =
    clfModels.get(dir) {
      val docs = Tables.documents(spark, dir)
      val cap = 2000.0
      val n = docs.count()
      val sampled = graft.operators.Sampling.hashSample(
        docs, col("doc_id").cast("string"),
        math.min(1.0, cap / math.max(1L, n)))
        .withColumn("toks", tokens(col("text")))
      graft.operators.LinearClassifier.train(
        sampled.withColumn("is_target", (col("lang") === "en").cast("int")),
        "toks", labelCol = "is_target", dim = 1024, iters = 50)
    }

  def qualityClassifierStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
    val model = classifierModel(spark, dir)
    docs
      .withColumn("p", graft.operators.LinearClassifier
        .scoreCol(docs, col("toks"), model))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("p")), 3).as("mean_p"),
        round(avg(when(col("p") >= 0.5, 1.0).otherwise(0.0)), 3)
          .as("frac_kept"))
      .orderBy(col("lang"))
  }

  /** DuckDB CTE chain ending in `clf_scored(doc_id, lang, p)` — an
    * independent recomputation of [[graft.operators.LinearClassifier]]
    * scoring under the inlined trained model: tokenize (the shared
    * whitespace contract), bucket each token by the md5 60-bit hash mod
    * dim, L1-normalize counts by the doc's token total, then fold
    * bias + Σ w[bk]·v in ASCENDING bucket order — `list_prepend(bias,
    * list(term ORDER BY bk))` reduced left-to-right is associatively
    * identical to the Scala loop `z = bias; z += w(idx(i))*v(i)` over
    * the sorted index array, so z (and p before rounding) matches
    * bit-for-bit up to libm-exp ulp. Empty/whitespace-only docs score
    * sigmoid(bias), mirroring scoreCol's degraded-row contract.
    * Shared by the batch stats oracle and the streaming per-doc oracle.
    */
  private[queries] def classifierScoredCtes(
      m: graft.operators.LinearClassifier.Model): String = {
    import OracleGen.{dbl, dblList}
    s"""clf_w AS (SELECT ${dblList(m.weights.toSeq)} AS wt),
       |clf_t AS (
       |  SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |clf_tk AS (
       |  SELECT doc_id, len(t) AS n, unnest(t) AS token
       |  FROM clf_t WHERE len(t) > 0),
       |clf_terms AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % ${m.dim} AS bk,
       |    count(*) / any_value(n) AS v
       |  FROM clf_tk GROUP BY doc_id, bk),
       |clf_z AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(${dbl(m.bias)},
       |        list(wt[CAST(bk AS INTEGER) + 1] * v ORDER BY bk)),
       |      (a, b) -> a + b) AS z
       |  FROM clf_terms CROSS JOIN clf_w GROUP BY doc_id),
       |clf_scored AS (
       |  SELECT d.doc_id, d.lang,
       |    1.0 / (1.0 + exp(-(COALESCE(z.z, ${dbl(m.bias)})))) AS p
       |  FROM clf_t d LEFT JOIN clf_z z USING (doc_id))""".stripMargin
  }

  private def qualityClassifierStatsOracle(
      spark: SparkSession, dir: String): String = {
    val m = classifierModel(spark, dir)
    s"""WITH ${classifierScoredCtes(m)}
       |SELECT lang, count(*) AS n_docs,
       |  round(avg(p), 3) AS mean_p,
       |  round(avg(CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END), 3) AS frac_kept
       |FROM clf_scored GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------- per-domain caps

  /** Per-domain document caps (the C4/CCNet anti-domination step: no
    * single domain may contribute more than `cap` documents), keeping
    * the best docs per domain by a deterministic quality rank — here
    * n_chars descending with doc_id tie-break (length is the standard
    * cheap quality proxy; swap in any per-doc score).
    *
    * Scale shape: [[graft.operators.TopNByKey]] — NOT the window
    * row_number form the oracle SQL uses. The window shuffles and
    * sorts every row of every domain just to discard all but cap; the
    * bounded-buffer aggregate emits ≤ cap rows per domain from each
    * map task (partial ObjectHashAggregate, plan-asserted in
    * TopNSpec), so a hot domain — the exact case caps exist for —
    * costs the same shuffle bytes as a tiny one. Equivalence of the
    * two forms is what this query's oracle checks. Output is
    * cap × |domains| rows, always driver-safe.
    */
  def domainCapSample(spark: SparkSession, dir: String): DataFrame = {
    val cap = 15
    graft.operators.TopNByKey.topN(
        Tables.documents(spark, dir), Seq("source"),
        ord = col("n_chars"), id = col("doc_id"), n = cap, asc = false)
      .select(col("source"), col("id").as("doc_id"),
        col("ord").cast("long").as("n_chars"), col("rk"))
      .orderBy(col("source"), col("rk"))
  }

  private val domainCapSampleSql =
    """SELECT source, doc_id, n_chars, rk FROM (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 15 ORDER BY source, rk""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "doc_chunks" -> QueryDef(chunkDocs(_, _), Some(chunkDocsSql)),
    "pii_scan_stats" -> QueryDef(piiScanStats, Some(piiScanStatsSql)),
    "pii_redact" -> QueryDef(piiRedact, Some(piiRedactSql)),
    "rule_filter_stats" -> QueryDef(ruleFilterStats, Some(ruleFilterStatsSql)),
    "dsir_weights" -> QueryDef(dsirWeights, Some(dsirWeightsSql)),
    "domain_cap_sample" -> QueryDef(domainCapSample, Some(domainCapSampleSql)),
    "quality_classifier_stats" -> QueryDef(qualityClassifierStats,
      OracleGen.sql("quality_classifier_stats")(qualityClassifierStatsOracle))
  )
}
