package graft

import org.apache.spark.sql.Row
import graft.queries.TextQueries

/** Gates for the retrieval surface: BM25 ranked retrieval
  * (`bm25_top_docs`) and the length-bucket padding audit
  * (`length_buckets`). The DuckDB oracle hash-compares both at driver
  * time; here we pin the BM25 formula against a hand-computed corpus
  * and the properties the oracle can't see (partitioning independence
  * of the sorted float fold).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** documents.parquet with a known 4-doc corpus: doc 0 is the query
    * ("apple banana"), docs 8..10 the corpus. */
  private lazy val tinyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    Seq(
      (0L, "apple banana", "en", "s1", 12L),
      (8L, "apple apple cherry", "en", "s1", 18L),
      (9L, "banana cherry date fig", "en", "s1", 22L),
      (10L, "cherry date", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25 matches the hand-computed Lucene-shape formula") {
    // N=3 corpus docs, avgdl=3; apple and banana each have df=1 →
    // idf = ln(1 + 2.5/1.5). doc 8: tf(apple)=2, dl=3 →
    // tfnorm = 2*2.2 / (2 + 1.2*(0.25+0.75*3/3)). doc 9: tf(banana)=1,
    // dl=4 → tfnorm = 2.2 / (1 + 1.2*(0.25+0.75*4/3)). doc 10 shares
    // no term and must not appear.
    val idf = math.log(1.0 + 2.5 / 1.5)
    val exp8 = round4(idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0)))
    val exp9 = round4(idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0)))
    val rows = TextQueries.bm25TopDocs(spark, tinyDir).collect().toSeq
    assert(rows === Seq(
      Row(0L, 1L, 8L, exp8),
      Row(0L, 2L, 9L, exp9)))
  }

  test("bm25 + maxsim rank-tie: equal round(4) scores break by doc_id " +
      "asc through the full catalog paths (VERDICT r16 #8)") {
    // Both engines rank with (score DESC, doc_id) AFTER round(4) — a
    // 4-decimal score collision is the one remaining cross-engine float
    // hazard class. Construct the collision directly: docs 8 and 9 are
    // IDENTICAL, so their BM25 scores (same tf/dl) and MaxSim scores
    // (same chunk features) are bit-equal, forcing the tie-break.
    val dir = java.nio.file.Files.createTempDirectory("graft_tie").toString
    Seq(
      (0L, "apple banana", "en", "s1", 12L),
      (8L, "apple cherry", "en", "s1", 12L),
      (9L, "apple cherry", "en", "s1", 12L),
      (10L, "cherry date", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bm25 = TextQueries.bm25TopDocs(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val tied = bm25.filter(r => r._3 == 8L || r._3 == 9L)
    assert(tied.size == 2 && tied(0)._4 == tied(1)._4,
      s"docs 8/9 must both rank with equal scores, got $bm25")
    assert(tied(0)._3 == 8L && tied(1)._3 == 9L &&
      tied(0)._2 + 1 == tied(1)._2,
      s"tie must break by doc_id asc into adjacent ranks, got $tied")
    val ms = TextQueries.maxsimTopDocs(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val msTied = ms.filter(r => r._3 == 8L || r._3 == 9L)
    assert(msTied.size == 2 && msTied(0)._4 == msTied(1)._4,
      s"maxsim: docs 8/9 must tie exactly, got $ms")
    assert(msTied(0)._3 == 8L && msTied(1)._3 == 9L &&
      msTied(0)._2 + 1 == msTied(1)._2,
      s"maxsim tie must break by doc_id asc into adjacent ranks, got $msTied")
  }

  test("bm25 ranks are contiguous with non-increasing scores") {
    val rows = TextQueries.bm25TopDocs(spark, sf0001)
      .collect().toSeq.groupBy(_.getLong(0))
    assert(rows.size === 8) // doc_id 0..7 all retrieve something
    rows.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)) === (1L to rs.size))
      val scores = rs.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bm25 result is independent of the shuffle partitioning") {
    val at8 = TextQueries.bm25TopDocs(spark, sf0001).collect().toSeq
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = TextQueries.bm25TopDocs(spark, sf0001).collect().toSeq
      assert(at3 === at8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("bm25 public operator: caller-tokenized build + scored match the formula") {
    // the public form owns nothing about the slice contract: caller
    // tokenizes (here: uppercase-preserving split, unlike the catalog's
    // lower()), picks ids, and passes its own query batch
    import org.apache.spark.sql.functions.{col, split}
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_pub").toString
    val corpus = Seq(
      (8L, "Apple Apple cherry"), (9L, "banana cherry date fig"),
      (10L, "cherry date"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("terms"))
    val idx = graft.operators.Bm25.build(corpus, base)
    val queries = Seq((7L, "Apple banana")).toDF("query_id", "text")
      .select(col("query_id"), split(col("text"), " ").as("terms"))
    val rows = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scored(spark, idx, queries), k = 5).collect().toSeq
    val idf = math.log(1.0 + 2.5 / 1.5)
    val exp8 = round4(idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0)))
    val exp9 = round4(idf * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0)))
    assert(rows === Seq(Row(7L, 1L, 8L, exp8), Row(7L, 2L, 9L, exp9)))
    // non-default k1/b change scores (the parameters are live)
    val loose = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scored(spark, idx, queries, k1 = 0.5, b = 0.0),
      k = 5).collect().toSeq
    assert(loose.map(_.getLong(2)).toSet === Set(8L, 9L))
    assert(loose.map(_.getDouble(3)) !== rows.map(_.getDouble(3)))
  }

  test("bm25 chunked pushdown: over-threshold term set keeps a true IN " +
      "pushdown on every posting scan, results unchanged") {
    // 20 distinct query terms against a 6-term in-filter threshold →
    // scoredFromPairs must split into ceil(20/6)=4 pruned scans, each
    // under the threshold (true IN pushdown, no min/max range
    // degradation), and the union must score identically to the
    // single-scan form at a high threshold
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_chunk").toString
    // 1001-term vocabulary so the 20-term batch is SELECTIVE (2% <<
    // SeekSelectivityCeiling) — the seek path must engage; the dense
    // regime has its own gate below
    val corpus = spark.range(1000).selectExpr("id AS doc_id",
      "array(concat('t', id), concat('t', (id + 1) % 1000), 'common') AS terms")
    val idx = graft.operators.Bm25.build(corpus, base)
    val pairs = (0 until 20).map(i => (5L, s"t$i")).toArray
    val confKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(confKey)
    def run(): Seq[Row] = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scoredFromPairs(spark, idx, pairs), k = 25)
      .collect().toSeq
    try {
      spark.conf.set(confKey, "10000")
      val single = run()
      spark.conf.set(confKey, "6")
      val chunkedDf = graft.operators.Bm25.topDocs(
        graft.operators.Bm25.scoredFromPairs(spark, idx, pairs), k = 25)
      val p = chunkedDf.queryExecution.executedPlan.toString
      val tfScans = p.split("\n")
        .filter(l => l.contains("FileScan") && l.contains("bm25_tf"))
      assert(tfScans.length >= 4,
        s"expected >= 4 chunked posting scans, got ${tfScans.length}")
      tfScans.foreach { l =>
        assert(l.contains("INSET") || l.contains("In(term"),
          s"chunk scan without IN pushdown: ${l.take(300)}")
      }
      assert(chunkedDf.collect().toSeq === single,
        "chunked scoring diverged from the single-scan form")
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("bm25 seek-vs-scan: a dense term set skips the isin seek, " +
      "scores identically") {
    // 20 of 41 vocabulary terms (49% >> SeekSelectivityCeiling): the
    // pushed-set seek cannot skip any row group, so scoring must serve
    // from the plain posting scan — no In(term)/INSET on any tf scan —
    // and match the seek form's scores exactly (same aggregation, same
    // fold order)
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_dense").toString
    val corpus = spark.range(40).selectExpr("id AS doc_id",
      "array(concat('t', id), concat('t', (id + 1) % 40), 'common') AS terms")
    val idx = graft.operators.Bm25.build(corpus, base)
    val pairs = (0 until 20).map(i => (5L, s"t$i")).toArray
    val denseDf = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scoredFromPairs(spark, idx, pairs), k = 25)
    val p = denseDf.queryExecution.executedPlan.toString
    val tfScans = p.split("\n")
      .filter(l => l.contains("FileScan") && l.contains("bm25_tf"))
    assert(tfScans.nonEmpty && tfScans.forall(l =>
      !l.contains("INSET") && !l.contains("In(term")),
      s"dense batch must not push the term set:\n" +
        tfScans.map(_.take(300)).mkString("\n"))
    // exact parity with the seek path forced on the SAME (corpus,
    // batch) via the seekCeiling knob: both regimes are pure plan
    // choices over identical scoring math
    val seekDf = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scoredFromPairs(spark, idx, pairs,
        seekCeiling = 1.0), k = 25)
    val ps = seekDf.queryExecution.executedPlan.toString
    assert(ps.split("\n").exists(l => l.contains("FileScan") &&
        l.contains("bm25_tf") && (l.contains("INSET") || l.contains("In(term"))),
      "forced-seek form must push the term set")
    assert(denseDf.collect().toSeq === seekDf.collect().toSeq,
      "dense scan plan diverged from the seek plan")
  }

  test("bm25 posting write spreads a hot term across partitions, volume bounded") {
    // 2000 docs all containing the stopword-grade term "the" (50% of
    // all postings) + one unique term each: range-partitioning on term
    // alone would put every "the" posting in ONE writer partition (the
    // build-time straggler); the (term, doc_id) range key must spread
    // it while keeping each output file a contiguous term range
    import org.apache.spark.sql.functions.{col, input_file_name}
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_skew").toString
    val corpus = spark.range(2000)
      .selectExpr("id AS doc_id", "array('the', concat('t', id)) AS terms")
    // AQE correctly coalesces this tiny shuffle to one partition; the
    // property under test is the RANGE KEY at production volume, so pin
    // the partition count for the build only
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val idx =
      try graft.operators.Bm25.build(corpus, base)
      finally spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val byFile = spark.read.parquet(idx.tfPath)
      .groupBy(input_file_name().as("f"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(byFile.length > 1, "skew corpus should write multiple partitions")
    val hotFiles = spark.read.parquet(idx.tfPath)
      .where(col("term") === "the")
      .select(input_file_name()).distinct().count()
    assert(hotFiles > 1,
      s"hot term confined to $hotFiles file(s) — write-time skew not spread")
    val counts = byFile.map(_._2.toDouble)
    val mean = counts.sum / counts.length
    assert(counts.max <= 4.0 * mean,
      s"max partition volume ${counts.max} exceeds 4x mean $mean")
    // scoring over the de-skewed layout is unchanged
    val q = Seq((0L, Seq("the"))).toDF("query_id", "terms")
    val scored = graft.operators.Bm25.scored(spark, idx, q)
    assert(scored.count() === 2000)
  }

  test("bm25 public operator matches a driver-computed reference on random corpora") {
    // an independent scala implementation of the whole contract —
    // Lucene formula, distinct query terms, SORTED float fold, round(4)
    // — checked exactly against the operator on seeded random corpora
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (0 until 3).foreach { trial =>
      val corpus = (0 until 5 + rnd.nextInt(8)).map { i =>
        (100L + i,
          Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
      }
      val queries = (0 until 2).map { i =>
        (i.toLong, Seq.fill(2 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))))
      }
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_bm25_prop$trial").toString
      val idx = graft.operators.Bm25.build(
        corpus.toDF("doc_id", "terms"), base)
      val got = graft.operators.Bm25.scored(spark, idx,
          queries.toDF("query_id", "terms"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // reference: driver-side, from first principles
      val dl = corpus.map { case (id, ts) => id -> ts.length }.toMap
      val n = corpus.size
      val avgdl = corpus.map(_._2.length).sum.toDouble / n
      val df = corpus.flatMap { case (_, ts) => ts.distinct }
        .groupBy(identity).map { case (t, xs) => t -> xs.size }
      val tf = corpus.flatMap { case (id, ts) =>
        ts.groupBy(identity).map { case (t, xs) => (id, t) -> xs.size }
      }.toMap
      val want = (for {
        (qid, qts) <- queries
        (did, _) <- corpus
        perTerm = qts.distinct.flatMap { t =>
          tf.get((did, t)).map { f =>
            math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
              (f * 2.2) /
              (f + 1.2 * (0.25 + 0.75 * dl(did) / avgdl))
          }
        }
        if perTerm.nonEmpty
      } yield (qid, did) -> round4(perTerm.sorted.foldLeft(0.0)(_ + _)))
        .toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("Rrf fusion matches a driver-computed reference on random arms") {
    val rnd = new scala.util.Random(11)
    (0 until 3).foreach { trial =>
      val nArms = 2 + rnd.nextInt(2)
      val arms = (0 until nArms).map { _ =>
        (0L until 3L).flatMap { q =>
          rnd.shuffle((10L until 20L).toList).take(3 + rnd.nextInt(5))
            .zipWithIndex.map { case (d, i) => (q, d, i + 1) }
        }
      }
      val got = graft.operators.Rrf.fuse(
          arms.map(_.toDF("query_id", "doc_id", "rk")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = arms.flatten
        .groupBy { case (q, d, _) => (q, d) }
        .map { case (k, xs) =>
          val cs = xs.map { case (_, _, rk) => 1.0 / (60.0 + rk) }.sorted
          k -> BigDecimal(cs.foldLeft(0.0)(_ + _))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      assert(got === want, s"trial $trial")
    }
  }

  test("Rrf public operator: fusion matches the hand-computed formula") {
    // arm A ranks docs (1,2), arm B ranks (2,3): doc 2 gets
    // 1/62 + 1/61, docs 1 and 3 get 1/61 and 1/62 — fused order 2,1,3
    val armA = Seq((0L, 1L, 1), (0L, 2L, 2)).toDF("query_id", "doc_id", "rk")
    val armB = Seq((0L, 2L, 1), (0L, 3L, 2)).toDF("query_id", "doc_id", "rk")
    val rows = graft.operators.Rrf.topDocs(
      graft.operators.Rrf.fuse(Seq(armA, armB)), k = 3).collect().toSeq
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows === Seq(
      Row(0L, 1L, 2L, r6(1.0 / 62 + 1.0 / 61)),
      Row(0L, 2L, 1L, r6(1.0 / 61)),
      Row(0L, 3L, 3L, r6(1.0 / 62))))
    // k0 is live: a huge k0 flattens contributions toward arm count
    val flat = graft.operators.Rrf.topDocs(
      graft.operators.Rrf.fuse(Seq(armA, armB), k0 = 1000000), k = 1)
      .collect().head
    assert(flat.getLong(2) === 2L)
  }

  test("CrossEncoder public operator: overlap kernel on caller frames") {
    // query 100's terms fully overlap doc 5 (ratio 1.0) and half-overlap
    // doc 6 (ratio 0.5); the md5 epsilon is < 1e-3 so it cannot reorder
    val q = Seq((100L, Seq("alpha", "beta"))).toDF("query_id", "terms")
    val d = Seq(
      (5L, Seq("alpha", "beta", "gamma")),
      (6L, Seq("beta", "delta")),
      (7L, Seq("unrelated"))).toDF("doc_id", "terms")
    val rows = graft.operators.CrossEncoder.rerank(spark, q, d,
      pairs = Array((100L, 5L), (100L, 6L)), k = 5).collect().toSeq
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      Seq((100L, 1L, 5L), (100L, 2L, 6L)))
    val s = rows.map(_.getDouble(3))
    assert(s(0) >= 1.0 && s(0) < 1.001 && s(1) >= 0.5 && s(1) < 0.501)
    // doc 7 was not a candidate pair — it must not appear even though
    // it is in the corpus frame
    assert(!rows.exists(_.getLong(2) == 7L))
  }

  test("sparse cosine: df cap is a no-op at/above the corpus max df") {
    import org.apache.spark.sql.functions.col
    val slice = Tables.documents(spark, sf0001).where(col("doc_id") < 100)
      .select(col("doc_id"),
        queries.TextQueries.tokens(col("text")).as("terms"))
    val capped = queries.TextQueries
      .sparseCosineTopPairs(slice, maxDf = 100, topK = 20).collect().toSeq
    val uncapped = queries.TextQueries
      .sparseCosineTopPairs(slice, maxDf = Long.MaxValue, topK = 20)
      .collect().toSeq
    assert(capped.nonEmpty)
    assert(capped === uncapped)
  }

  test("sparse cosine: a binding df cap drops the hot token's quadratic pairs") {
    // 30 docs share ONE hot token (df=30) and carry a unique token each:
    // uncapped, the hot token alone contributes C(30,2)=435 pairs; with
    // maxDf=10 it leaves the index and NO pair survives — any token's
    // pair contribution is bounded by maxDf*(maxDf-1)/2
    val docs = spark.range(30)
      .selectExpr("id AS doc_id", "array('hot', concat('u', id)) AS terms")
    val uncapped = queries.TextQueries
      .sparseCosineTopPairs(docs, maxDf = Long.MaxValue, topK = 1000)
    assert(uncapped.count() === 435L)
    val capped = queries.TextQueries
      .sparseCosineTopPairs(docs, maxDf = 10, topK = 1000)
    assert(capped.count() === 0L,
      "df<=10 cap must drop every pair of the df=30 hot token")
    // norms keep the dropped token (index pruning, not doc rewriting):
    // two docs sharing a SURVIVING token still divide by full norms
    val docs2 = docs.unionByName(spark.range(30, 32)
      .selectExpr("id AS doc_id", "array('hot', 'shared') AS terms"))
    val pair = queries.TextQueries
      .sparseCosineTopPairs(docs2, maxDf = 10, topK = 1000).collect()
    assert(pair.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((30L, 31L)))
    // dot = 1 (shared only), norms = sqrt(2)*sqrt(2) = 2 → 0.5 exactly
    assert(pair.head.getDouble(2) === 0.5)
  }

  test("maxsim: identical-text corpus doc ranks first for its query twin") {
    // doc 8 repeats doc 0's text verbatim: every query chunk's best
    // cosine against doc 8 is 1.0 (the identical chunk), so no corpus
    // doc can outscore it
    val dir = java.nio.file.Files.createTempDirectory("graft_maxsim").toString
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, txt, "en", "s1", 100L),
      (8L, txt, "en", "s1", 100L),
      (9L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s1", 100L),
      (10L, "different entirely", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.maxsimTopDocs(spark, dir)
      .where($"query_id" === 0L).collect()
    assert(rows.head.getLong(2) === 8L, s"expected doc 8 first: ${rows.toSeq}")
    // 40 tokens → 3 chunks, each max-cos 1.0 → score 3.0 exactly
    assert(rows.head.getDouble(3) === 3.0)
  }

  test("maxsim ranks are contiguous and independent of partitioning") {
    val at8 = TextQueries.maxsimTopDocs(spark, sf0001).collect().toSeq
    at8.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)) === (1L to rs.size))
      val scores = rs.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = TextQueries.maxsimTopDocs(spark, sf0001).collect().toSeq
      assert(at3 === at8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("maxsim ANN: top-1 self-retrieval survives the candidate stage") {
    // doc 8 repeats doc 0's text verbatim → identical chunk features →
    // identical POOLED vector → identical LSH signature, so doc 8 is
    // always in the query's own probed bucket, becomes a candidate, and
    // the exact re-rank must put it first with the exact-path score
    val dir = java.nio.file.Files.createTempDirectory("graft_maxsim_ann").toString
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, txt, "en", "s1", 100L),
      (8L, txt, "en", "s1", 100L),
      (9L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s1", 100L),
      (10L, "different entirely", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.maxsimAnnTopDocs(spark, dir)
      .where($"query_id" === 0L).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) === 8L, s"expected doc 8 first: ${rows.toSeq}")
    assert(rows.head.getDouble(3) === 3.0) // 3 chunks × max-cos 1.0
  }

  test("maxsim ANN: re-rank scores equal the exact path; candidates bounded") {
    val exact = TextQueries.maxsimTopDocs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = TextQueries.maxsimAnnTopDocs(spark, sf0001).collect()
    assert(ann.nonEmpty)
    // the approximate path may MISS docs (candidate recall), but every
    // (query, doc) it scores must carry the exact MaxSim score — the
    // re-rank is exact over the candidate set; ann scores can never
    // exceed the query's exact top-1
    val exactTop1 = exact.groupBy(_._1._1).map { case (q, m) => q -> m.values.max }
    ann.foreach { r =>
      val (q, d, s) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      exact.get((q, d)).foreach(es =>
        assert(es === s, s"score mismatch for ($q, $d)"))
      assert(s <= exactTop1(q) + 1e-9)
    }
    // ranks contiguous per query
    ann.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.size))
    }
    // candidate stage emits ≤ perQuery pairs per query
    val cands = graft.operators.MaxSim.candidates(
      TextQueries.maxsimChunks(spark, sf0001).where($"doc_id" < 8)
        .select($"doc_id".as("query_id"), $"cidx".as("qidx"), $"feat".as("q_feat")),
      TextQueries.maxsimChunks(spark, sf0001).where($"doc_id" >= 8),
      dim = 16, perQuery = 20, nProbeBits = 3, seed = 42L).collect()
    cands.groupBy(_.getLong(0)).foreach { case (q, cs) =>
      assert(cs.length <= 20, s"query $q has ${cs.length} candidates")
    }
  }

  test("maxsim ANN: one-shot annTopDocs equals the prebuilt-bucket path") {
    // the build-free operator entry must stay consistent with the
    // catalog's amortized path — same buckets (same nBits/planes/seed),
    // same candidates, same re-rank
    val qc = TextQueries.maxsimChunks(spark, sf0001).where($"doc_id" < 8)
      .select($"doc_id".as("query_id"), $"cidx".as("qidx"), $"feat".as("q_feat"))
    val corpus = TextQueries.maxsimChunks(spark, sf0001).where($"doc_id" >= 8)
    val nDocs = Tables.documents(spark, sf0001).where($"doc_id" >= 8).count()
    val oneShot = graft.operators.MaxSim.annTopDocs(qc, corpus,
        dim = 16, k = 5, perQuery = 20, nProbeBits = 3, seed = 42L,
        nDocsHint = Some(nDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val cached = TextQueries.maxsimAnnTopDocs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(oneShot.toSeq == cached.toSeq)
    assert(oneShot.nonEmpty)
  }

  test("maxsim ANN result is independent of the shuffle partitioning") {
    // exercises the cidx-ordered pooling fold: unordered float sums
    // would flap LSH bucket membership across partitionings
    val at8 = TextQueries.maxsimAnnTopDocs(spark, sf0001).collect().toSeq
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = TextQueries.maxsimAnnTopDocs(spark, sf0001).collect().toSeq
      assert(at3 === at8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("hybrid RRF: doc winning both arms is top-1 with exact fusion score") {
    // doc 8 repeats doc 0's text verbatim: the vector arm must rank it
    // first (identical pooled vector → cosine 1.0), and the lexical arm
    // must rank it first too (it is the only corpus doc sharing any
    // query term), so rrf = 1/61 + 1/61 — asserting the exact fused
    // value pins the 1/(60+rank) arithmetic end to end
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid").toString
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, txt, "en", "s1", 100L),
      (8L, txt, "en", "s1", 100L),
      (9L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s1", 100L),
      (10L, "different entirely", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.hybridRrfTopDocs(spark, dir)
      .where($"query_id" === 0L).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) === 8L, s"expected doc 8 first: ${rows.toSeq}")
    assert(rows.head.getDouble(3) ===
      BigDecimal(2.0 / 61.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hybrid RRF: every result comes from an arm; ranks contiguous; " +
      "partitioning-independent") {
    val rows = TextQueries.hybridRrfTopDocs(spark, sf0001).collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted == (1L to rs.size))
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(rs.size <= 5)
    }
    // membership: every fused doc must be in the union of the two arms'
    // top-20 lists, and its score must equal the recomputed fusion
    val bmTop = operators.TopNByKey.topN(
        TextQueries.bm25Scored(spark, sf0001), Seq("query_id"),
        org.apache.spark.sql.functions.col("score"),
        org.apache.spark.sql.functions.col("doc_id"), n = 20, asc = false)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val pool = TextQueries.maxsimPool(spark, sf0001)
    val vecTop = operators.MaxSim.rankedCandidatesFromBuckets(
        TextQueries.maxsimChunks(spark, sf0001).where($"doc_id" < 8)
          .select($"doc_id".as("query_id"), $"cidx".as("qidx"),
            $"feat".as("q_feat")),
        spark.read.parquet(pool._1),
        operators.LshAnn.hyperplanes(16, pool._2, 42L),
        dim = 16, perQuery = 20, nProbeBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      val exp = bmTop.get(k).map(b => 1.0 / (60 + b)).getOrElse(0.0) +
        vecTop.get(k).map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(exp > 0.0, s"doc $k in neither arm")
      assert(r.getDouble(3) ===
        BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"fusion mismatch at $k")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = TextQueries.hybridRrfTopDocs(spark, sf0001).collect().toSeq
      assert(at3 === rows)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("cross-encoder rerank: full-overlap twin wins; scores bounded and " +
      "deterministic") {
    // doc 8 repeats doc 0's text verbatim → overlap ratio exactly 1.0;
    // docs 9/10 share no token → ratio 0. The md5 epsilon is < 1e-3 so
    // it can reorder only equal-overlap docs — doc 8 must rank first
    // with 1.0 <= score < 1.001
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank").toString
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, txt, "en", "s1", 100L),
      (8L, txt, "en", "s1", 100L),
      (9L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s1", 100L),
      (10L, "different entirely", "en", "s1", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.rerankCrossTopDocs(spark, dir)
      .where($"query_id" === 0L).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) === 8L, s"expected doc 8 first: ${rows.toSeq}")
    val s = rows.head.getDouble(3)
    assert(s >= 1.0 && s < 1.001, s"twin score out of band: $s")
    // every score carries the bounded epsilon: value in [0, 1.001)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.001))
  }

  test("cross-encoder rerank: results come from the hybrid top-20; " +
      "partitioning-independent") {
    val rerank = TextQueries.rerankCrossTopDocs(spark, sf0001).collect().toSeq
    assert(rerank.nonEmpty)
    rerank.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted == (1L to rs.size))
      assert(rs.size <= 5)
    }
    // candidate containment: rerank can only reorder the fused top-20,
    // never introduce a doc outside it
    val fusedTop20 = operators.TopNByKey.topN(
        TextQueries.hybridRrfFused(spark, sf0001), Seq("query_id"),
        org.apache.spark.sql.functions.col("rrf_score"),
        org.apache.spark.sql.functions.col("doc_id"), n = 20, asc = false)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    rerank.foreach { r =>
      assert(fusedTop20.contains((r.getLong(0), r.getLong(2))),
        s"reranked doc outside the hybrid top-20: $r")
    }
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val at3 = TextQueries.rerankCrossTopDocs(spark, sf0001).collect().toSeq
      assert(at3 === rerank)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "8")
  }

  test("length buckets: exact padding accounting on the tiny corpus") {
    // token counts 2, 3, 4, 2 — all in the 16 bucket for source s1
    val rows = TextQueries.lengthBuckets(spark, tinyDir).collect().toSeq
    assert(rows === Seq(Row("s1", 16L, 4L, 11L, 16L * 4 - 11, round4((64.0 - 11) / 64))))
  }

  test("length buckets partition every document exactly once") {
    val docs = Tables.documents(spark, sf0001)
    val rows = TextQueries.lengthBuckets(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum === docs.count())
    rows.foreach { r =>
      assert(r.getLong(4) >= 0L) // padding can never be negative
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
  }
}
