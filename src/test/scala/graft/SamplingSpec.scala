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

  test("the filter is map-side: no shuffle in the sampled scan") {
    val plan = Sampling.hashSample(docs, col("text"), 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
