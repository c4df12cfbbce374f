package graft.operators

import org.apache.spark.sql.DataFrame

/** Safe large-set IN pushdown.
  *
  * Spark's parquet filter conversion turns an under-threshold IN into
  * a LEFT-DEEP binary Or tree (`values.reduceLeft(FilterApi.or)`), and
  * parquet-mr's row-group evaluator walks it recursively — depth grows
  * linearly in the literal count, and a few thousand literals overflow
  * the executor stack (measured on this box: FATAL at ~5.9k string
  * literals, Spark 4.1 local mode — the error kills the whole
  * application, it is not containable per-task). Spark's own default
  * `spark.sql.parquet.pushdown.inFilterThreshold=10` sidesteps the
  * tree by degrading big INs to a [min,max] range filter, but that
  * throws away the row-group seek on term-clustered files — the whole
  * point of pushing the set down. The fix for both problems at once:
  * chunk the value set and UNION the per-chunk scans. Every chunk
  * keeps a true IN pushdown (tight row-group seeks) and its Or tree
  * stays shallow, for ANY caller batch size.
  *
  * Partition-column INs (e.g. `shard_id` on partitionBy'd indexes) do
  * NOT need this: they prune files at planning time on the driver,
  * where the optimizer's InSet conversion applies, and never build a
  * parquet filter tree.
  */
object Pushdown {

  /** Literals per chunk: well under the measured-fatal Or-tree depth
    * (~5.9k) with a wide margin, and small enough that the per-chunk
    * recursion cost is trivial, while keeping the union arm count low
    * (a 10k-term batch = 40 scans).
    */
  val MaxInLiterals = 256

  /** The effective chunk size for `spark`'s session: a chunk larger
    * than `spark.sql.parquet.pushdown.inFilterThreshold` would be
    * rewritten to a seek-less [min,max] range filter, so the bound is
    * min(threshold, [[MaxInLiterals]]) — sessions at Spark's default
    * threshold of 10 get 10-literal chunks (shallow AND pushed), the
    * repo's sessions at 10000 get 256.
    */
  def sessionChunk(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(1, math.min(MaxInLiterals,
      scala.util.Try(spark.conf.get(
        "spark.sql.parquet.pushdown.inFilterThreshold").toInt)
        .getOrElse(MaxInLiterals)))

  /** `scan(chunk)` per ≤`chunk`-sized slice of `values`, unioned.
    * Callers build the isin-filtered scan in `scan`; an empty value
    * set degrades to one `scan(empty)` call (an empty isin is
    * always-false, preserving semantics). `values` is deduplicated
    * here: a duplicate landing in two different chunks would match its
    * rows in two union arms and DOUBLE them — a semantics change vs
    * the single `isin` this replaces, which is duplicate-safe. Prefer
    * the session-aware overload — a fixed `chunk` above the session's
    * in-filter threshold loses the per-chunk IN pushdown (see
    * [[sessionChunk]]).
    */
  def inChunks[T](values: Seq[T], chunk: Int = MaxInLiterals)(
      scan: Seq[T] => DataFrame): DataFrame = {
    val vs = values.distinct
    if (vs.isEmpty) scan(vs)
    else vs.grouped(chunk).map(scan).reduce(_ union _)
  }

  /** Session-aware [[inChunks]]: chunk = [[sessionChunk]], so every
    * chunk stays under BOTH the Or-tree depth cap and the session's
    * in-filter threshold.
    */
  def inChunks[T](spark: org.apache.spark.sql.SparkSession,
      values: Seq[T])(scan: Seq[T] => DataFrame): DataFrame =
    inChunks(values, sessionChunk(spark))(scan)
}
