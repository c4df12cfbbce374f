package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Catalog, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact top-10 nearest neighbors (squared L2, ascending, ties by id) of
    * the vec_id=0 embedding — the reference's one query type
    * (`/root/reference/src/ivf_index.rs:252-266`) without the IVF pruning.
    */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnExact(spark, "/root/testdata/sf0.001", qid = 0L, k = 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Catalog.oracleSql
}
