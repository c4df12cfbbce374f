package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BitLength64

/** Mergeable quantile sketch over non-negative integer-scaled measures:
  * an HDR-histogram-style log-linear bucketization (power-of-two
  * exponent from integer bit-length, top [[SigBits]] significant bits
  * kept), the fixed-memory alternative to `approx_percentile`'s opaque
  * t-digest — with the same cross-engine property as [[Hll]] and
  * [[CountMin]]: every bucket boundary and count is integer math the
  * DuckDB oracle recomputes exactly (`length(bin(v))`), and the single
  * float operation per quantile is one exactly-rounded division back to
  * original units.
  *
  * Bucket of v: keep the top SigBits significant bits —
  * `lo = (v >> s) << s`, `width = 2^s`, `s = max(bitlen(v) − SigBits, 0)`
  * — covering [lo, lo+width). Values below 2^SigBits are exact
  * (width 1). Relative error of the midpoint estimate ≤ 2^−SigBits
  * (1/64 ≈ 1.6%), gated in SketchSpec against exact percentiles.
  *
  * Scale shape: ≤ 2^(SigBits−1) buckets per power of two, ≤ ~1.8k rows
  * per key for any 64-bit measure — one map-side-combinable groupBy
  * count regardless of input size, vs exact `percentile`'s collect of
  * every value per group. Merge is bucket-wise count addition, and
  * sketch(A ⊎ B) == merge(sketch(A), sketch(B)) EXACTLY (SketchSpec),
  * so shards/streams/incremental batches union for free.
  */
object QuantileSketch {

  /** Default significant bits kept per bucket: relative error ≤
    * 2^−SigBits (1/64 ≈ 1.6%) — what every oracled catalog query
    * uses. Callers needing tighter quantiles pass `sigBits` (error
    * halves and bucket count doubles per extra bit; 10 → 0.1% at
    * ≤ ~29k buckets per key for 64-bit measures).
    */
  val SigBits = 6

  /** Build the sketch: (keyCol, lo, w, cnt) bucket-count rows.
    * `value` must be a non-negative long (callers pre-scale, e.g.
    * `round(price * 100).cast("long")` for exact cents).
    */
  def sketch(df: DataFrame, keyCol: String, value: Column,
      sigBits: Int = SigBits): DataFrame =
    df.select(col(keyCol), value.as("v"))
      // nulls are ignored, matching exact `percentile` semantics — an
      // unfiltered null would otherwise become a (lo=null, w=1) bucket
      // that inflates n and shifts every cumulative rank
      .where(col("v").isNotNull)
      // the documented contract is non-negative: a negative long has
      // bit length 64, so s = 64−sigBits and lo = (v>>s)<<s ≈ −2^58 — a
      // huge negative bucket that sorts FIRST in the cumulative window
      // and silently drags every quantile toward −2^58/divisor. Fail
      // loudly map-side instead (the build dimension-guard idiom)
      .withColumn("v",
        when(col("v") < 0,
          raise_error(concat(
            lit("QuantileSketch: negative value (callers pre-scale to "
              + "non-negative longs): "), col("v").cast("string"))))
          .otherwise(col("v")))
      .withColumn("s", greatest(BitLength64.col(col("v")) - lit(sigBits), lit(0)))
      .select(col(keyCol),
        expr("shiftleft(shiftright(v, s), s)").as("lo"),
        expr("shiftleft(CAST(1 AS BIGINT), s)").as("w"))
      .groupBy(col(keyCol), col("lo"), col("w"))
      .agg(count(lit(1)).as("cnt"))

  /** Bucket-wise sum of two sketches over the same key/value columns:
    * exactly the sketch of the unioned inputs (SketchSpec gate).
    */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(keyCol), col("lo"), col("w"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Nearest-rank quantiles from a sketch: for each (name, p) the
    * midpoint of the INTEGER range [lo, lo+w−1] of the first bucket
    * whose cumulative count reaches ⌈p·n⌉ — exact in the width-1
    * regime — mapped back to original units as (2·lo + w − 1) / divisor
    * (divisor = 2 × the caller's pre-scale factor; 200.0 for cents).
    * Cumulative ranks are exact longs; `lo` is unique per key so the
    * running-sum window is deterministic.
    */
  def quantiles(sk: DataFrame, keyCol: String, divisor: Double,
      qs: Seq[(String, Double)]): DataFrame = {
    val cum = sk
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col(keyCol)).orderBy(col("lo"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(keyCol))))
      // midpoint in DOUBLE arithmetic: lo and w carry ≤ SigBits+1
      // significant bits, so lo*2+w is exact in double at ANY
      // magnitude, where the long form 2·lo+w−1 would overflow for
      // values with bit length ≥ 63; the −1 rounds identically in both
      // engines (IEEE), keeping oracle bit-parity
      .withColumn("est",
        (col("lo").cast("double") * 2 + col("w").cast("double") - 1)
          / lit(divisor))
    val aggs = qs.map { case (name, p) =>
      // EXACT nearest-rank test: p is the rational round(p·10^6)/10^6
      // and cum ≥ ⌈p·n⌉ becomes the integer comparison
      // cum·10^6 ≥ num·n — ceil(p·n) in double arithmetic overshoots a
      // whole rank whenever p·n lands just above an integer (0.07·100
      // = 7.000000000000001 → rank 8, a different bucket), a drift the
      // oracle then had to replicate to hash-match (r15 review).
      // decimal(38,0) keeps the products exact past the long range
      // (DuckDB's side is HUGEINT for the same reason).
      val num = math.round(p * 1000000L)
      min(when(
        col("cum").cast("decimal(38,0)") * lit(1000000L) >=
          col("n").cast("decimal(38,0)") * lit(num),
        col("est"))).as(name)
    }
    cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
