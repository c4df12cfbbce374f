package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for data layout — the multi-dimensional
  * locality technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: rows
  * sorted by the bit-interleaved code of two columns land in files whose
  * per-file (min, max) ranges are tight in BOTH dimensions, so a 2-D box
  * predicate skips most files/row-groups. A linear sort gives perfect
  * pruning on its leading column and none on the other; Z-order trades a
  * little of each for useful pruning on both.
  *
  * The code is pure integer bit arithmetic in whole-stage codegen; the
  * layout write is `repartitionByRange(z)` + `sortWithinPartitions(z)` —
  * one range shuffle, the same cost class as any clustered write. At
  * 100 TB this is a one-time (or compaction-time) layout decision that
  * every subsequent multi-dimension scan benefits from; ZOrderSpec
  * measures the file-skipping win directly from per-file min/max.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns, `bits` low
    * bits each. Values ≥ 2^bits SATURATE at 2^bits − 1 (clamped before
    * interleaving), so out-of-range rows cluster at the top of the
    * curve instead of silently wrapping around and aliasing with the
    * smallest codes — which would interleave rows from opposite ends of
    * the domain into the same files and quietly destroy the skipping.
    * Bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def morton2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of [1,31]: $bits")
    val cap = (1L << bits) - 1
    // clamp BOTH ends and coalesce nulls to 0: Spark's least() SKIPS
    // nulls (null would silently become the cap, clustering null rows
    // with the genuine maxima and widening those files' min/max on the
    // other dimension), and a negative coordinate would interleave as
    // sign-extended all-ones — the same top-of-curve aliasing
    val ac = greatest(least(coalesce(a.cast("long"), lit(0L)), lit(cap)), lit(0L))
    val bc = greatest(least(coalesce(b.cast("long"), lit(0L)), lit(cap)), lit(0L))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ac, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as DuckDB SQL, generated from the same loop so
    * the oracle can never drift from the Spark expression.
    */
  def morton2Sql(a: String, b: String, bits: Int = 16): String = {
    // every term fully parenthesized: DuckDB (like PostgreSQL) gives
    // <<, >>, & and | EQUAL precedence with left associativity, so
    // `x << 2 | y << 3` would parse as `((x << 2) | y) << 3`. BIGINT
    // casts keep the shifts in 64-bit — on an INTEGER column,
    // `1 << 31` would overflow INT32 where Spark computes in Long.
    val cap = (1L << bits) - 1
    // the same null/negative clamp as the Spark expression above
    val ac = s"greatest(least(coalesce(CAST(($a) AS BIGINT), 0), $cap), 0)"
    val bc = s"greatest(least(coalesce(CAST(($b) AS BIGINT), 0), $cap), 0)"
    (0 until bits).flatMap(i => Seq(
      s"((($ac >> $i) & 1) << ${2 * i})",
      s"((($bc >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" | ")
  }

  /** Write `df` Z-order-clustered on (a, b) into `numFiles` files. */
  def writeClustered(df: DataFrame, a: String, b: String, path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(!df.columns.contains("__z"),
      "input already has a __z column — it would be silently dropped")
    df.withColumn("__z", morton2(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
