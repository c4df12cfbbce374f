package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for aggregations whose partial state does
  * NOT compress map-side.
  *
  * For algebraic aggregates (sum/count/min/max/avg) Spark's partial
  * aggregation already neutralizes key skew — each partition emits one
  * partial row per key regardless of row counts, so no salting is
  * needed (see q1's plan: `partial_sum` before the exchange). The
  * problem cases are holistic aggregates where per-key state grows with
  * distinct values: exact count-distinct and collect_set. For those, a
  * hot key concentrates its whole value set on one reducer; at 100 TB a
  * key holding 1% of rows is a straggler. The fix is a two-phase shape
  * where the first shuffle is keyed by (key, value) — uniform as long
  * as values vary — and the second carries only compressed state.
  * (Join-side skew is AQE's job: `spark.sql.adaptive.skewJoin`.)
  */
object Skew {

  /** Exact count-distinct per key without the expand+skew of
    * countDistinct: phase 1 dedups on (key, value) — uniformly
    * distributed; phase 2 counts per key.
    */
  def countDistinctTwoPhase(df: DataFrame, key: Column, value: Column,
      outName: String = "n_distinct"): DataFrame = {
    // countDistinct ignores NULL values but still emits the group; keep
    // both behaviors: count over non-null pairs, then re-attach keys
    // whose values were all NULL with count 0
    val pairs = df.select(key.as("__key"), value.as("__val"))
    val counted = pairs
      .where(col("__val").isNotNull)
      .distinct()
      .groupBy(col("__key"))
      .agg(count(lit(1)).as(outName))
    // null-safe equality: groupBy groups NULL keys together, but a plain
    // join would never match NULL = NULL, reporting 0 for a NULL key whose
    // values are non-null
    pairs.select(col("__key")).distinct().as("l")
      .join(counted.as("r"), col("l.__key") <=> col("r.__key"), "left")
      .select(col("l.__key").as("__key"),
        coalesce(col(outName), lit(0L)).as(outName))
  }

  /** collect_set per key with salting: phase 1 builds per-salt partial
    * sets (bounded by distinct-values/salt), phase 2 unions k × nSalts
    * small sets.
    */
  def saltedCollectSet(df: DataFrame, key: Column, value: Column,
      nSalts: Int = 16, outName: String = "values"): DataFrame =
    df.select(key.as("__key"), value.as("__val"))
      .withColumn("__salt", pmod(xxhash64(col("__val")), lit(nSalts)))
      .groupBy(col("__key"), col("__salt"))
      .agg(collect_set(col("__val")).as("__pset"))
      .groupBy(col("__key"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__pset")))))
        .as(outName))

  /** Manually salted equi-join for a skewed LEFT side when AQE's
    * skew-join can't apply (e.g. the join is wrapped in a non-AQE
    * context, or the skew is known up front and the right side is too
    * big to broadcast whole but small per key): each left row gets a
    * random-ish-but-DETERMINISTIC salt from its own content, the right
    * side replicates ×nSalts, and the join key becomes (key, salt) — a
    * hot key's rows spread over nSalts reducers instead of one.
    *
    * Exactness: every left row meets every right row of its key exactly
    * once (the right replica with the matching salt), so the result
    * multiset equals the plain join's (asserted in SkewSpec). Cost: the
    * right side shuffles ×nSalts — use when left-skew dominates, i.e.
    * |right| · nSalts ≪ hot-key volume.
    *
    * @param saltBy a left column whose values vary within the hot key
    *   (a unique id) — salts derive from xxhash64 of it, so the spread
    *   is partitioning-independent and reproducible.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, nSalts: Int = 16): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1: $nSalts")
    // the salt column is injected on BOTH sides and dropped from the
    // result — guard against clobbering a caller's column of that name
    // (same contract as ZOrder.writeClustered's __z guard)
    require(!left.columns.contains("__salt") &&
        !right.columns.contains("__salt"),
      "saltedJoin: input already has a column named __salt")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(lit((0 until nSalts).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
