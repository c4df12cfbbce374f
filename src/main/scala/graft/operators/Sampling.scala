package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the training-data-pipeline
  * sampling primitive. A row is kept iff the first 8 hex chars of
  * md5(key) fall below ⌊fraction · 16^8⌋, so the selected set is a pure
  * function of row CONTENT: identical across engines, partitionings,
  * retries, and runs (unlike `rand()`/`sample()`, which seed per
  * partition), and re-runnable incrementally — new data joins the sample
  * at the same rate without reshuffling old decisions.
  *
  * At 100 TB this is a map-side filter inside whole-stage codegen — no
  * shuffle, no driver state; nested fractions compose (a 1% sample is a
  * subset of a 10% sample since both are prefix thresholds).
  */
object Sampling {

  /** 8-hex-char threshold for a fraction of the 16^8 = 2^32 prefix space.
    * fraction ≥ 1.0 returns "g" — lexicographically above every hex
    * prefix, so a strict `<` keeps ALL rows (a "ffffffff" threshold
    * would silently drop the ~2^-32 of rows whose prefix is exactly
    * ffffffff).
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0, 1]: $fraction")
    if (fraction >= 1.0) "g"
    else f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  /** Uniform deterministic sample: keep ~`fraction` of rows by content
    * hash of `key` (use a stable unique column: id or normalized text).
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.where(substring(md5(key), 1, 8) < lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: per-stratum fractions (strata not
    * in the map get `defaultFraction`). The threshold is a CASE over the
    * stratum column — still one map-side filter, no per-stratum passes.
    */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (s, f)) => when(stratum === s, lit(thresholdHex(f))).otherwise(acc)
    }
    df.where(substring(md5(key), 1, 8) < threshold)
  }
}
