package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** Unit gates for the curation operators. The synthetic corpus contains
  * no PII, so detection/redaction behavior is asserted on constructed
  * strings here; the catalog queries' corpus-level zero counts are
  * oracle-checked by the driver.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text")
      .select(CurationQueries.redactPii(col("text")).as("r"))
      .head().getString(0)

  test("PII redaction replaces each type with its token") {
    assert(redact("mail me at jane.doe+x@example.co.uk today") ==
      "mail me at <EMAIL> today")
    assert(redact("server at 192.168.001.1 down") == "server at <IP> down")
    assert(redact("card 4111111111111111 declined") == "card <ID> declined")
    assert(redact("call +1 (555) 123-4567 now") == "call <PHONE> now")
    // an email's host must not leak into the phone/id patterns
    assert(redact("a@b.com 12345678901234 +44 20 7946 0958") ==
      "<EMAIL> <ID> <PHONE>")
    // clean text passes through untouched
    val clean = "spark batch sort merge join"
    assert(redact(clean) == clean)
  }

  test("PII scan counts matches and affected docs per type") {
    val df = Seq(
      (1L, "contact a@b.com or c@d.org"),
      (2L, "ping 10.0.0.1 then 10.0.0.2 or a@b.com"),
      (3L, "nothing here")).toDF("doc_id", "text")
    // reuse the same projection shape as the catalog query, on a local df
    val counts = df.select(explode(array(
      CurationQueries.PiiPatterns.map { case (name, pat, _) =>
        struct(lit(name).as("pii_type"),
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n"))
      }: _*)).as("p"))
      .select(col("p.pii_type"), col("p.n"))
      .groupBy("pii_type")
      .agg(sum("n").as("n_matches"),
        sum(when(col("n") > 0, 1).otherwise(0)).as("n_docs_with"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(counts("email") == (3L, 2L))
    assert(counts("ipv4") == (2L, 1L))
    assert(counts("phone")._1 == 0L)
    assert(counts("id_number")._1 == 0L)
  }

  test("rule filter: per-rule counts add up on the corpus") {
    val rows = CurationQueries.ruleFilterStats(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows("docs_total")
    assert(total > 0)
    // every per-rule count and the kept count are within [0, total]
    rows.foreach { case (_, n) => assert(n >= 0 && n <= total) }
    // kept_all is consistent with the union bound of the violations
    val violations = rows.view.filterKeys(
      k => k != "docs_total" && k != "kept_all").values.sum
    assert(rows("kept_all") >= total - violations)
    // the synthetic corpus has only clean lowercase words: no digit or
    // over-long tokens, so those two rules never fire
    assert(rows("digit_heavy") == 0L)
    assert(rows("word_too_long") == 0L)
  }

  test("DSIR weights: English target docs score higher on average") {
    val w = CurationQueries.dsirWeights(spark, sf001)
    val docs = Tables.documents(spark, sf001).select("doc_id", "lang")
    val byLang = w.join(docs, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("dsir_per_token")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // importance weights must rank the target language's own docs
    // above the rest — the whole point of the method
    assert(byLang(true) > byLang(false),
      s"en ${byLang(true)} !> other ${byLang(false)}")
  }

  test("chunking tiles every document: coverage, overlap, truncated tail") {
    val chunks = CurationQueries.chunkDocs(spark, sf001).collect()
      .groupBy(_.getLong(0))
    val nTokens = Tables.documents(spark, sf001).where(col("doc_id") < 30)
      .select(col("doc_id"),
        size(graft.queries.TextQueries.tokens(col("text"))))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == nTokens.keySet)
    val (w, s) = (64, 48)
    nTokens.foreach { case (doc, n) =>
      val cs = chunks(doc).sortBy(_.getLong(1))
      val expect = if (n <= w) 1 else (n - w + s - 1) / s + 1
      assert(cs.length == expect, s"doc $doc: ${cs.length} chunks, want $expect")
      // every chunk is full-size except possibly the last; the last
      // reaches exactly the end of the doc
      cs.init.foreach(c => assert(c.getLong(2) == w))
      val lastStart = (cs.length - 1) * s
      assert(cs.last.getLong(2) == math.min(w, n - lastStart))
      assert(lastStart + cs.last.getLong(2) == n, s"doc $doc tail uncovered")
    }
  }

  test("DSIR weights are partitioning-independent") {
    val a = CurationQueries.dsirWeights(spark, sf001).collect().toSeq
    val b = CurationQueries.dsirWeights(spark, sf001).collect().toSeq
    assert(a == b)
  }

  test("DSIR LM build is partitioning-independent (uncached)") {
    // dsirWeights serves the memoized LM, so exercise the BUILD path
    // directly under two shuffle widths — integer bucket counts make
    // the log-weights exactly reproducible regardless of partitioning
    val at8 = CurationQueries.buildDsirLm(spark, sf001)
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = CurationQueries.buildDsirLm(spark, sf001)
      assert(at3 == at8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("memoized LM rebuilds when the data under the same path changes") {
    // the per-(JVM, dir) caches key on Tables.dataKey (dir + file
    // length/mtime fingerprint): regenerating testdata mid-JVM must
    // serve a FRESH model, not the stale memo (round-6 ADVICE #4)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_datakey").toString
    def write(docs: Seq[(Long, String, String)]): Unit =
      docs.map { case (id, text, lang) => (id, text, lang, "s1", 10L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(Seq((0L, "alpha beta gamma", "en"), (1L, "delta epsilon", "xx")))
    val k1 = Tables.dataKey(dir)
    val lm1 = CurationQueries.dsirLm(spark, dir)
    // different content AND different byte length → fingerprint differs
    // even on coarse mtime granularity
    write(Seq((0L, "alpha", "en"),
      (1L, "delta epsilon zeta eta theta iota kappa", "xx"),
      (2L, "mu nu xi omicron pi rho", "xx")))
    assert(Tables.dataKey(dir) != k1, "fingerprint did not change")
    val lm2 = CurationQueries.dsirLm(spark, dir)
    assert(lm1 != lm2, "stale LM served after data regeneration")
  }

  test("token budget cut equals the global-order prefix rule") {
    // driver-compute the textbook rule: sort (q desc, doc_id), keep the
    // prefix with cumulative tokens ≤ 10,000 — the two-phase
    // histogram+boundary plan must reproduce it exactly
    val docs = graft.Tables.documents(spark, sf0001)
      .withColumn("toks", graft.queries.TextQueries.tokens(col("text")))
      .select(col("doc_id"),
        size(array_distinct(col("toks"))).cast("long").as("q"),
        size(col("toks")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, q, _) => (-q, id) }
    var acc = 0L
    val kept = docs.takeWhile { case (_, _, t) => acc += t; acc <= 10000L }
    val row = graft.queries.QualityQueries.tokenBudgetCut(spark, sf0001).head()
    assert(row.getLong(0) === 10000L)
    assert(row.getLong(1) === docs.length)
    assert(row.getLong(2) === docs.map(_._3).sum)
    assert(row.getLong(3) === kept.length)
    assert(row.getLong(4) === kept.map(_._3).sum)
    assert(row.getLong(6) === kept.map(_._2).min)
  }
}
