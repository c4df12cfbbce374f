package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization of a BOUNDED result into a local relation —
  * the round-10 cache-hygiene idiom shared by operators and catalog
  * queries that persist() an intermediate their plan reads twice: the
  * result must be computed before the cache is released (a lazy return
  * would silently recompute the unpersisted lineage), and callers of a
  * public operator have no harness `clearCache()` to rely on. Only for
  * results bounded by construction (heavy hitters ≤ φ⁻¹ rows, pairwise
  * overlap ≤ |keys|²/2 by its output contract); row order is preserved.
  */
object Eager {
  def localize(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
}
