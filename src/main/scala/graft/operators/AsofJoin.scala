package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the right row with the greatest
  * `time <= left.time` for the same key (inclusive-match semantics, the
  * same contract as DuckDB's `ASOF JOIN` / pandas `merge_asof`). Spark has
  * no native as-of operator; the naive forms are a per-row correlated
  * subquery (non-plannable) or a range join that explodes to O(left ×
  * right-per-key) before filtering.
  *
  * This implementation is the scalable composition: tag and union both
  * sides, ONE shuffle on the key, then a running last-non-null
  * carry-forward window per key ordered by (time, side). Right rows sort
  * before left rows at equal time, so an exact-time match is picked up
  * (inclusive). Cost is a single sort-based window over left+right — no
  * row explosion, state per key is one carried struct, and the shuffle
  * key is the join key, so skew behaves like any keyed window.
  *
  * Contract: right must be unique per (key, time) — pre-aggregate if not
  * (the carried value at a duplicate timestamp would otherwise depend on
  * sort tie order).
  */
object AsofJoin {

  /** @param left    left table; all its columns are preserved
    * @param right   right table; must contain `key` and `time` and be
    *                unique per (key, time)
    * @param key     equi-join key column name (same name both sides)
    * @param time    event-time column name (same name both sides)
    * @param inner   true → drop left rows with no prior right row
    *                (DuckDB ASOF JOIN); false → keep with nulls (ASOF
    *                LEFT JOIN)
    * @param suffix  appended to carried right column names that clash
    *                with left column names (time always carries as
    *                `time + suffix`)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
      inner: Boolean = true, suffix: String = "_right"): DataFrame = {
    val rightValueCols = right.columns.filterNot(Set(key, time)).toSeq
    val carried = struct((time +: rightValueCols).map(col): _*)
    val carriedType = right.select(carried).schema.head.dataType
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    val taggedLeft = left.select(
      col(key).as("__key"), col(time).as("__time"), lit(1).as("__is_left"),
      leftStruct.as("__l"), lit(null).cast(carriedType).as("__r"))
    val taggedRight = right.select(
      col(key).as("__key"), col(time).as("__time"), lit(0).as("__is_left"),
      lit(null).cast(leftType).as("__l"), carried.as("__r"))

    // right (__is_left=0) sorts before left at equal __time → inclusive
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = taggedLeft.unionByName(taggedRight)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
    val kept = if (inner) joined.where(col("__asof").isNotNull) else joined

    val leftNames = left.columns.toSet
    val rightOut = (time +: rightValueCols).map { c =>
      val outName = if (leftNames.contains(c)) c + suffix else c
      // a suffixed name colliding with an EXISTING left column would
      // yield a duplicate-named output (ambiguous downstream) — the
      // same reserved-name guard the other operators apply up front
      require(outName == c || !leftNames.contains(outName),
        s"asof: suffixed right column '$outName' collides with a left " +
          "column — pass a different suffix")
      col(s"__asof.$c").as(outName)
    }
    kept.select(col("__l.*") +: rightOut: _*)
  }
}
