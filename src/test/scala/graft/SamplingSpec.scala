package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic hash-sampling invariants: content-addressed selection,
  * partitioning independence, nesting, stratified rates.
  */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)

  test("thresholdHex maps fractions onto the 2^32 prefix space") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.75) == "c0000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    // sentinel above every hex prefix: strict '<' keeps ALL rows,
    // including the ~2^-32 whose md5 prefix is exactly ffffffff
    assert(Sampling.thresholdHex(1.0) == "g")
    intercept[IllegalArgumentException](Sampling.thresholdHex(1.5))
  }

  test("a fraction-1.0 stratum keeps every row") {
    val total = docs.where(col("lang") === "en").count()
    val kept = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
        Map("en" -> 1.0), defaultFraction = 0.0)
      .where(col("lang") === "en").count()
    assert(kept == total, s"full-rate stratum dropped rows: $kept/$total")
    assert(Sampling.hashSample(docs, col("text"), 1.0).count() == docs.count())
  }

  test("weightedSample refuses an input that already has __es_key") {
    val poisoned = docs.withColumn("__es_key", lit(1.0))
    intercept[IllegalArgumentException](
      Sampling.weightedSample(poisoned, col("text"), lit(1.0), 5,
        col("doc_id")))
  }

  test("sample rate is close to the requested fraction") {
    val n = docs.count().toDouble
    val got = Sampling.hashSample(docs, col("text"), 0.25).count().toDouble
    assert(math.abs(got / n - 0.25) < 0.08, s"rate=${got / n}")
  }

  test("selection is content-addressed: partitioning-independent and stable") {
    val a = Sampling.hashSample(docs, col("text"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17), col("text"), 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("prefix thresholds nest: the 10% sample is a subset of the 30%") {
    val small = Sampling.hashSample(docs, col("text"), 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, col("text"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("stratified rates follow the per-stratum fractions") {
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
        Map("en" -> 0.1, "zh" -> 0.9), defaultFraction = 0.5)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(l: String): Double = sampled.getOrElse(l, 0L).toDouble / totals(l)
    assert(rate("en") < 0.25, s"en=${rate("en")}")
    assert(rate("zh") > 0.7, s"zh=${rate("zh")}")
    assert(math.abs(rate("de") - 0.5) < 0.25, s"de=${rate("de")}")
  }

  test("weighted sample: heavier rows overrepresented, deterministic, no corpus shuffle") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf001)
    val sample = Sampling.weightedSample(docs, col("text"), col("n_chars"),
      k = 100, tie = col("doc_id"))
    val rows = sample.select("doc_id", "n_chars").collect()
    assert(rows.length == 100)
    // inclusion probability ∝ n_chars ⇒ the sample's mean length must
    // sit clearly above the corpus mean
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.1,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
    // deterministic across partitionings
    val again = Sampling.weightedSample(docs.repartition(13), col("text"),
      col("n_chars"), k = 100, tie = col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
    // global top-k, not a global sort: TakeOrderedAndProject in the plan
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("weighted sample excludes non-positive weights instead of electing them") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = Seq((1L, "a", 10L), (2L, "b", 0L), (3L, "c", -5L), (4L, "d", 1L))
      .toDF("id", "text", "w")
    val kept = Sampling.weightedSample(df, col("text"), col("w"),
      k = 10, tie = col("id")).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("mixture weights: p_alpha is a flattened distribution over sources") {
    val rows = graft.queries.QualityQueries
      .sourceMixtureWeights(spark, sf001).collect()
    assert(rows.nonEmpty)
    val pSum = rows.map(_.getDouble(rows.head.fieldIndex("p_alpha"))).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"p_alpha sums to $pSum")
    val natSum = rows.map(_.getDouble(rows.head.fieldIndex("natural_frac"))).sum
    assert(math.abs(natSum - 1.0) < 1e-3)
    // temperature 0.5 flattens: below-average sources get factor > 1,
    // above-average get < 1 — and the ordering is monotone in size
    val byTok = rows.sortBy(_.getLong(rows.head.fieldIndex("n_tokens")))
    val factors = byTok.map(_.getDouble(rows.head.fieldIndex("sample_factor")))
    assert(factors.head >= factors.last,
      "smallest source should be oversampled relative to the largest")
    assert(factors.zip(factors.tail).forall { case (a, b) => a >= b },
      "sample_factor must decrease as source token count grows")
  }

  test("applying the mixture down-samples toward the flattened target") {
    val rows = graft.queries.QualityQueries
      .mixtureApplyStats(spark, sf001).collect()
    assert(rows.nonEmpty)
    val iDocs = rows.head.fieldIndex("n_docs")
    val iKept = rows.head.fieldIndex("n_kept")
    val iTgt = rows.head.fieldIndex("target_frac")
    val iAch = rows.head.fieldIndex("achieved_frac")
    rows.foreach { r =>
      assert(r.getLong(iKept) <= r.getLong(iDocs))
      assert(r.getDouble(iTgt) <= 1.0 && r.getDouble(iTgt) > 0.0)
      // hash sampling tracks the target up to per-stratum noise
      assert(math.abs(r.getDouble(iAch) - r.getDouble(iTgt)) < 0.25,
        s"${r.getString(0)}: achieved ${r.getDouble(iAch)} vs target ${r.getDouble(iTgt)}")
    }
    assert(rows.exists(r => r.getDouble(iTgt) < 1.0),
      "mixture should down-sample at least one over-represented source")
  }

  test("source KL divergence: non-negative, totals reconcile") {
    val rows = graft.queries.QualityQueries
      .sourceTokenDivergence(spark, sf001).collect()
    assert(rows.nonEmpty)
    val iTok = rows.head.fieldIndex("n_tokens")
    val iKl = rows.head.fieldIndex("kl")
    rows.foreach { r =>
      // Gibbs: KL >= 0 (tiny negative only from float summation noise)
      assert(r.getDouble(iKl) >= -1e-5,
        s"${r.getString(0)}: negative KL ${r.getDouble(iKl)}")
    }
    val corpusTokens = Tables.documents(spark, sf001)
      .select(explode(graft.queries.TextQueries.tokens(col("text"))))
      .count()
    assert(rows.map(_.getLong(iTok)).sum == corpusTokens,
      "per-source token totals must partition the corpus")
    assert(rows.exists(_.getDouble(iKl) > 0.0),
      "at least one source should diverge from the pool")
  }

  test("training shards are token-balanced within 30% of ideal") {
    val rows = graft.queries.QualityQueries
      .trainingShardStats(spark, sf001).collect()
    assert(rows.length == 16, "every shard must be non-empty at sf0.01")
    val devIdx = rows.head.fieldIndex("dev_frac")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(devIdx)) < 0.30,
        s"shard ${r.getLong(0)} deviates ${r.getDouble(devIdx)} from ideal")
    }
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum
    assert(total == Tables.documents(spark, sf001).count())
  }

  test("the filter is map-side: no shuffle in the sampled scan") {
    val plan = Sampling.hashSample(docs, col("text"), 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
