package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan builder plus (when SQL-expressible) the
  * equivalent DuckDB ANSI SQL over the same parquet tables, used by the
  * driver's hash-compare oracle. Column names/aliases MUST match between
  * the two — the compare sorts columns by name before hashing.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in graft.Bench's headline timing run. */
    bench: Boolean = true)

/** Registry of all operators exposed through SparkEntry. */
object Catalog {
  def all: Map[String, QueryDef] =
    VectorQueries.defs ++
      RelationalQueries.defs ++
      TextQueries.defs ++
      EventQueries.defs ++
      DedupQueries.defs ++
      QualityQueries.defs ++
      CurationQueries.defs ++
      IndexQueries.defs ++
      StreamQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.build }

  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }
}
