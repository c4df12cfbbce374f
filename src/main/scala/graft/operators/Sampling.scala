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
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    // validate BEFORE the keep-all fast path: fraction = 1.5 must be
    // the same range error the stratified path raises, not a silent
    // keep-everything
    val t = thresholdHex(fraction)
    if (fraction >= 1.0) df
    else df.where(substring(md5(key), 1, 8) < lit(t))
  }

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

  /** Content-hash uniform in (0, 1): 52 bits of md5(key) scaled into the
    * unit interval (+0.5 keeps it strictly inside). Deterministic and
    * engine-reproducible (`('0x' || substr(md5, 1, 13))::BIGINT` in
    * DuckDB).
    */
  def hashUniform(key: Column): Column =
    // first 52 bits via the native Md5Long60 expression (60 bits >> 8):
    // bit-identical to conv(substr(md5,1,13),16,10) — the 13-hex-digit
    // prefix IS the top 52 bits — without the composed form's three
    // string allocations per row (see Md5Long60's scaladoc); the DuckDB
    // twin stays ('0x' || substr(md5, 1, 13))::BIGINT
    (shiftright(graft.functions.Md5Long60.col(key), 8).cast("double") + 0.5) /
      4503599627370496.0 // 2^52

  /** Weighted sample WITHOUT replacement, k rows, inclusion probability
    * ∝ `weight` — Efraimidis-Spirakis A-ES with content-hash randomness:
    * each row gets key = ln(u)/w (u = [[hashUniform]]); the k LARGEST
    * keys are the sample (equivalent to ranking by u^(1/w); ln-form
    * avoids pow, whose cross-engine rounding is less predictable).
    *
    * Scale shape: one map-side key computation + a global top-k
    * (TakeOrderedAndProject — partial top-k per partition, k-sized
    * merge on the driver side of the exchange). No shuffle of the
    * corpus, no per-row state; deterministic across engines,
    * partitionings, and reruns.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int, tie: Column): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    // same guard as ZOrder.writeClustered's __z: the helper column is
    // injected and dropped, which would silently clobber a caller's
    // column of the same name
    require(!df.columns.contains("__es_key"),
      "weightedSample: input already has a column named __es_key")
    // E-S is defined for positive weights; non-positive-weight rows are
    // excluded rather than (wrongly) winning every sample via a
    // sign-flipped key. `tie` must be a unique column (e.g. the row id):
    // exact-duplicate keys hash to identical sample keys, and an
    // ambiguous order at the rank-k cutoff would make the kept set
    // nondeterministic.
    // NaN weights must not pass: NaN > 0 is true in Spark SQL and the
    // resulting NaN key sorts FIRST under desc, hijacking a top-k slot
    // on every run
    df.where(weight > 0 && !isnan(weight.cast("double")))
      .withColumn("__es_key", log(hashUniform(key)) / weight)
      .orderBy(col("__es_key").desc, tie)
      .limit(k)
      .drop("__es_key")
  }
}
