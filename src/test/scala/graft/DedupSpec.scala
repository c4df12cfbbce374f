package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf
import graft.queries.{DedupQueries, IndexQueries, TextQueries}
import graft.functions.Vec

/** Quality gates for the dedup + similarity operators: LSH candidate
  * recall vs brute force, SimHash behavior on duplicates, batch ANN
  * recall vs exact kNN.
  */
class DedupSpec extends SparkSpec {

  test("band bucket cap bounds a mega-cluster's pairs; cluster stays connected") {
    // 200 identical docs share every band bucket: uncapped, that ONE
    // bucket emits C(200,2)=19900 candidate pairs (the quadratic LSH
    // blowup a 100 TB corpus hits on boilerplate text); the l-side cap
    // bounds it at <= MaxBandBucket*m while every member still pairs
    // with the bucket's rank-1 doc, so the near-dup CLUSTER is intact
    import spark.implicits._
    // the generated/static oracles hard-code the same ceiling in SQL —
    // if this constant moves, move them together
    assert(DedupQueries.MaxBandBucket == 64)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_megacluster").toString
    val boiler = "quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 200).map(i => (i.toLong, boiler, "en", "s1", 10L)) ++
      Seq((900L, "an unrelated document entirely alone here", "en", "s1", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = DedupQueries.minhashVerifiedPairs(spark, dir).collect()
    assert(pairs.length < 19900,
      s"cap did not bind: ${pairs.length} pairs")
    assert(pairs.length >= 199, "cluster must stay connected")
    assert(pairs.forall(_.getDouble(2) == 1.0)) // identical docs
    // doc 0 (rank 1 in the bucket) anchors every other member
    val fromZero = pairs.filter(_.getLong(0) == 0L).map(_.getLong(1)).toSet
    assert(fromZero == (1L until 200L).toSet)
    val comp = graft.operators.ConnectedComponents.resolve(
      pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = comp.groupBy(_._2).view.mapValues(_.length).toMap
    assert(clusters == Map(0L -> 200),
      s"expected one 200-member cluster at id 0: $clusters")
  }

  test("minhash LSH finds every true near-dup pair (recall vs brute force)") {
    // brute-force truth: all pairs with shingle-Jaccard >= 0.7
    val docs = DedupQueries.shingledDocs(Tables.documents(spark, sf001))
    val a = docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val truth = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .where(col("jaccard") >= 0.7)
      .count()
    val stats = DedupQueries.minhashLshStats(spark, sf001).collect()(0)
    val nearDups = stats.getLong(stats.fieldIndex("n_near_dups"))
    assert(nearDups == truth, s"LSH verified=$nearDups truth=$truth")
    assert(truth > 0, "corpus should contain near-dups for this gate to bite")
  }

  test("native md5Long equals the composed built-in form bitwise") {
    import spark.implicits._
    val inputs = Seq("", "a", "i:tok", "héllo wörld", "日本語テスト",
      "0:the quick brown fox", "7:" + ("x" * 500)) ++
      (0 until 100).map(i => s"$i:shingle $i text")
    val df = inputs.toDF("s")
    val rows = df.select(
      DedupQueries.md5Long(col("s")).as("fast"),
      DedupQueries.md5LongSql(col("s")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"mismatch for input row: ${r.toSeq}"))
    // and the driver-side kernel agrees with the column form
    inputs.foreach { s =>
      val fromCol = df.where(col("s") === s)
        .select(DedupQueries.md5Long(col("s"))).head().getLong(0)
      assert(graft.functions.Md5Long60.compute(s.getBytes("UTF-8")) == fromCol)
    }
    // null propagates as null (both forms)
    val nulls = Seq[Option[String]](None).toDF("s")
      .select(DedupQueries.md5Long(col("s")).as("fast"),
        DedupQueries.md5LongSql(col("s")).as("ref")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("simhash of identical texts is identical; hamming 0") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val hashes = df.select(col("doc_id"),
      DedupQueries.simhashCol("text").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(3L))
  }

  test("exact dedup counts: unique + duplicates == docs") {
    val r = DedupQueries.exactStats(spark, sf001).collect()(0)
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
  }

  test("batch ANN with default probes: recall@10 >= 0.6 vs exact batch kNN") {
    val idx = IndexQueries.index(spark, sf001)
    val qs = Tables.embeddings(spark, sf001)
      .where(col("vec_id") < 8).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val approx = Ivf.searchBatch(spark, idx, qs, 10, 20).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = Ivf.searchBatch(spark, idx, qs, 10, 10000).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = qs.map { case (qid, _) =>
      (approx.getOrElse(qid, Set.empty) & exact(qid)).size.toDouble / exact(qid).size
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.6, s"batch ANN avg recall=$avg")
  }

  test("LSH-bucketed cosine ANN: recall vs brute force, deterministic") {
    import graft.operators.LshAnn
    val emb = Tables.embeddings(spark, sf001)
    val planes = LshAnn.hyperplanes(64, 4, 42L)
    val table = LshAnn.bucketed(emb, "vec_id", "embedding", planes).cache()
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val recalls = all.take(10).map { case (qid, q) =>
      val truth = all.map { case (id, v) => (id, cosine(q, v)) }
        .sortBy(p => (-p._2, p._1)).take(10).map(_._1).toSet
      val got = LshAnn.search(spark, table, "vec_id", "embedding",
        planes, q, 10, nProbeBits = 4).collect().map(_.getLong(0)).toSet
      (got & truth).size.toDouble / truth.size
    }
    val avg = recalls.sum / recalls.length
    // 4-bit signatures probe 5 of 16 buckets (~31% of the corpus); a
    // loose floor — exactness is IVF probe-all's job
    assert(avg >= 0.3, s"LSH ANN avg recall=$avg")
    // determinism across invocations
    val q0 = all(0)._2
    val a = LshAnn.search(spark, table, "vec_id", "embedding", planes, q0, 10)
      .collect().map(_.toSeq).toSeq
    val b = LshAnn.search(spark, table, "vec_id", "embedding", planes, q0, 10)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("LSH bit width scales with corpus size; buckets stay ~target-sized") {
    import graft.operators.LshAnn
    // nBits = ceil(log2(n/128)), clamped to [4, 24]: the probed fraction
    // (nBits+1)/2^nBits must SHRINK as n grows — a fixed width is not an
    // index at scale
    assert(LshAnn.suggestBits(1000) == 4)
    assert(LshAnn.suggestBits(100000) == 10)
    assert(LshAnn.suggestBits(1000000) == 13)
    assert(LshAnn.suggestBits(1000000000L) == 23)
    assert(LshAnn.suggestBits(1L << 62) == 24) // clamp
    def probedFraction(n: Long): Double = {
      val b = LshAnn.suggestBits(n)
      (b + 1).toDouble / (1L << b)
    }
    assert(probedFraction(1000000) < probedFraction(10000))
    assert(probedFraction(1000000) < 0.01, "1M vectors must probe <1%")

    // bucket population ≈ n / 2^bits on direction-uniform vectors
    val n = 4096L
    val dim = 16
    val bits = LshAnn.suggestBits(n) // 5 → expected 128/bucket
    val emb = graft.sources.VectorFormats.generate(spark, n, dim, seed = 7L)
    val planes = LshAnn.hyperplanes(dim, bits, 42L)
    val pops = LshAnn.bucketed(emb, "vec_id", "embedding", planes)
      .groupBy("bucket").count().collect().map(_.getLong(1))
    val expected = n.toDouble / (1L << bits)
    assert(pops.length >= (1 << bits) / 2,
      s"only ${pops.length} of ${1 << bits} buckets occupied")
    assert(pops.max <= 6 * expected,
      s"max bucket ${pops.max} vs expected ~$expected")
  }

  test("embedding near-dup candidate generation is bucket-local and sane") {
    val r = DedupQueries.embeddingNeardupStats(spark, sf001).collect()(0)
    val nPairs = r.getLong(0)
    // bucket-local pair count must be far below the all-pairs count
    val n = Tables.embeddings(spark, sf001).count()
    assert(nPairs > 0 && nPairs < n * (n - 1) / 4,
      s"candidate pairs $nPairs vs all-pairs ${n * (n - 1) / 2}")
  }

  test("substring dup spans == longest common substring, per pair") {
    // Any common substring of length L >= k yields a run of L-k+1
    // consecutive matching 8-grams at one delta, i.e. span_chars == L —
    // so max_span_chars must EQUAL the pair's true LCS length. Verify
    // against a driver-side DP over the raw texts for every reported
    // pair (the slice is 40 docs; texts are small).
    val spans = DedupQueries.substringDupSpans(spark, sf001).collect()
    assert(spans.nonEmpty, "slice should contain 20+ char shared spans")
    val texts = Tables.documents(spark, sf001)
      .where(col("doc_id") < 40).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lcs(s: String, t: String): Int = {
      var best = 0
      var prev = new Array[Int](t.length + 1)
      var cur = new Array[Int](t.length + 1)
      var i = 1
      while (i <= s.length) {
        var j = 1
        while (j <= t.length) {
          cur(j) = if (s(i - 1) == t(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
          j += 1
        }
        val tmp = prev; prev = cur; cur = tmp
        java.util.Arrays.fill(cur, 0)
        i += 1
      }
      best
    }
    spans.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val reported = r.getLong(r.fieldIndex("max_span_chars"))
      val truth = lcs(texts(a), texts(b))
      assert(reported == truth,
        s"pair ($a,$b): reported max span $reported, true LCS $truth")
    }
  }

  test("diverse sample caps every simhash bucket at 3, deterministically") {
    val kept = DedupQueries.simhashDiverseSample(spark, sf001).collect()
    assert(kept.nonEmpty)
    val perBucket = kept.groupBy(_.getLong(0))
    perBucket.foreach { case (bkt, rows) =>
      assert(rows.length <= 3, s"bucket $bkt kept ${rows.length} rows")
      val occupancy = rows.head.getLong(1)
      assert(rows.length == math.min(occupancy, 3L).toInt)
    }
    // occupancy sums back to the full slice: nothing lost before the cap
    assert(perBucket.values.map(_.head.getLong(1)).sum == 100L)
    // deterministic across runs (content-hash ranking, not rand())
    val again = DedupQueries.simhashDiverseSample(spark, sf001).collect()
    assert(kept.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("semantic decontam: best_d2 is the true min distance to the test set") {
    val out = graft.queries.QualityQueries.semanticDecontam(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    val test = Tables.embeddings(spark, sf001).where(col("vec_id") < 32)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val train = Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    out.foreach { r =>
      val id = r.getLong(0)
      val best = r.getDouble(r.fieldIndex("best_d2"))
      val nClose = r.getLong(r.fieldIndex("n_close"))
      val dists = test.map(t => d2(train(id), t))
      assert(best == dists.min, s"vec $id best_d2 $best != ${dists.min}")
      assert(nClose == dists.count(_ <= 1.35).toLong)
      assert(best <= 1.35, "emitted rows must actually be contaminated")
    }
  }

  test("sparse cosine pairs match driver-computed dense TF cosine") {
    val out = graft.queries.TextQueries.sparseCosinePairs(spark, sf001)
      .collect()
    assert(out.length == 20)
    val tfMaps = Tables.documents(spark, sf001)
      .where(col("doc_id") < 100).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      }.toMap
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ta, tb) = (tfMaps(a), tfMaps(b))
      val dot = ta.map { case (t, c) => c * tb.getOrElse(t, 0L) }.sum
      val na2 = ta.values.map(c => c * c).sum
      val nb2 = tb.values.map(c => c * c).sum
      val truth = dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble))
      assert(math.abs(r.getDouble(2) - truth) < 1e-6,
        s"pair ($a,$b): reported ${r.getDouble(2)}, truth $truth")
    }
    // ranked descending
    val sims = out.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
  }

  test("incremental near-dup equals the cross-split slice of the full pair set") {
    val row = DedupQueries.incrementalNeardupStats(spark, sf001).head()
    val nNew = row.getLong(0)
    val dupNew = row.getLong(2)
    assert(nNew > 0 && row.getLong(3) == nNew - dupNew)
    assert(dupNew <= nNew)
    // the full (batch) verified pair set restricted to new-vs-corpus
    // pairs must name exactly the same duplicate new docs
    val expected = DedupQueries.minhashVerifiedPairs(spark, sf001)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val (aNew, bNew) = (a % 10 >= 8, b % 10 >= 8)
        Seq(a).filter(_ => aNew && !bNew) ++ Seq(b).filter(_ => bNew && !aNew)
      }.toSet
    assert(dupNew == expected.size,
      s"incremental found $dupNew dup new docs, batch slice has ${expected.size}")
  }

  test("split leakage audit: cluster-hash split never splits a cluster") {
    val r = DedupQueries.splitLeakageAudit(spark, sf001).head()
    val nDocs = r.getLong(0)
    assert(nDocs == Tables.documents(spark, sf001).count())
    // both splits partition the corpus
    assert(r.getLong(3) + r.getLong(4) == nDocs) // safe train + val
    assert(r.getLong(5) + r.getLong(6) == nDocs) // naive train + val
    // the invariant the op exists for, computed from data: the
    // cluster-hash split can never straddle a near-dup cluster
    assert(r.getLong(9) == 0L, "safe split broke a cluster")
    // leaked docs only exist where a cluster actually split
    assert((r.getLong(7) == 0L) == (r.getLong(8) == 0L))
    // near-dup clusters exist at sf0.01, so the audit is non-vacuous
    assert(r.getLong(2) > 0L, "expected multi-doc near-dup clusters")
  }

  test("tokenizer contract: whitespace split, no empties") {
    import spark.implicits._
    val toks = Seq(("  a  b\t c \n", 1)).toDF("text", "x")
      .select(TextQueries.tokens(col("text")).as("t")).collect()(0).getSeq[String](0)
    assert(toks == Seq("a", "b", "c"))
  }
}
