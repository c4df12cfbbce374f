package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the maintenance operation every long-lived
  * 100 TB dataset needs: streaming ingests, incremental appends
  * (`Ivf.append`), and per-trigger foreachBatch writes all accumulate
  * files far below the efficient scan size, and a table of a million
  * 1 MB files pays per-file open/footer/scheduling costs that dwarf the
  * reads. Compaction rewrites a directory into ⌈bytes / target⌉ files,
  * optionally re-clustering on a sort key (e.g. a Z-order code or
  * `centroid_id`) so row-group pruning survives the rewrite.
  *
  * The rewrite is one job: read → range-partition (sorted) or
  * round-robin (unsorted) → write to a NEW directory. Swapping the new
  * directory in atomically is the table format's job (or the caller's,
  * via rename); this operator deliberately never deletes inputs.
  */
object Compaction {

  /** Total bytes of the data files under a path (recursive,
    * non-located — a size probe has no use for block locations, and
    * the located listing costs ~100× more per file; see
    * [[FsList]]).
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden filtering (a crashed write's _temporary/.../part-*.parquet
    // must not inflate the estimate) is [[FsList.files]]' own contract:
    // the walk never descends into a hidden directory and never emits a
    // hidden leaf, so no per-component re-check is needed here
    FsList.files(fs, new Path(path)).map(_.getLen).sum
  }

  /** Output file count for a given input size and per-file target. */
  def planFiles(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0: $targetBytes")
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
  }

  /** Rewrite `inPath` into `outPath` as ~`targetBytes` files.
    *
    * @param sortBy keep the data clustered on this column through the
    *   rewrite (range partition + sort within files); None = round-robin
    *   (pure size balancing).
    * @return the planned output file count
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, sortBy: Option[String] = None): Int = {
    val n = planFiles(dataBytes(spark, inPath), targetBytes)
    val df = spark.read.parquet(inPath)
    val shaped = sortBy match {
      case Some(c) =>
        df.repartitionByRange(n, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(n)
    }
    shaped.write.mode("overwrite").parquet(outPath)
    n
  }
}
