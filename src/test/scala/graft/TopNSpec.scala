package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TopNByKey

/** Gates for the bounded-state top-N-per-key aggregate: exact
  * equivalence with the window row_number form (the semantics the
  * oracle checks), PARTIAL aggregation in the plan (the whole point —
  * the window form has none), deterministic ties, and the
  * small-group / null edge cases.
  */
class TopNSpec extends SparkSpec {
  import spark.implicits._

  test("equals the window row_number top-N on a real table") {
    val orders = Tables.load(spark, sf001, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = TopNByKey.topN(orders, Seq("o_custkey"),
        col("o_totalprice"), col("o_orderkey"), n = 3, asc = false)
      .select(col("o_custkey"), col("rk"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("plan has partial aggregation (the window form cannot)") {
    val docs = Tables.documents(spark, sf001)
    val plan = TopNByKey.topN(docs, Seq("source"), col("n_chars"),
        col("doc_id"), n = 5, asc = false)
      .queryExecution.executedPlan.toString
    // typed-aggregator partial → exchange → final: two ObjectHashAggregate
    // nodes means each map task emits ≤ n rows per key BEFORE the shuffle
    val hashAggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(hashAggs >= 2, s"no partial aggregation in plan:\n$plan")
  }

  test("ties break by id ascending; ranks are 1-based in order") {
    val df = Seq((1L, 10L, "k"), (2L, 10L, "k"), (3L, 10L, "k"),
      (4L, 7L, "k")).toDF("id", "v", "k")
    val got = TopNByKey.topN(df, Seq("k"), col("v"), col("id"),
        n = 2, asc = false)
      .orderBy(col("rk")).collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 1L), (2, 2L)))
  }

  test("groups smaller than n return whole group, no padding") {
    val df = Seq((1L, 5L, "a"), (2L, 3L, "a"), (9L, 1L, "b"))
      .toDF("id", "v", "k")
    val got = TopNByKey.topN(df, Seq("k"), col("v"), col("id"), n = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 9L)))
  }

  test("NaN ordering values rank last under asc and cannot freeze the buffer") {
    // java.lang.Double.compare total order: NaN > any value, so under
    // asc a NaN candidate ranks after every real distance (the window's
    // behavior) — and a NaN arriving FIRST must still be evicted by
    // later, better candidates (a naive x<y comparator would make NaN
    // incomparable and freeze the top-k at the first k arrivals)
    val df = Seq((1L, Double.NaN, "k"), (2L, 5.0, "k"), (3L, 1.0, "k"),
      (4L, 3.0, "k")).toDF("id", "v", "k")
    val got = TopNByKey.topN(df.coalesce(1), Seq("k"), col("v"), col("id"),
        n = 2, asc = true)
      .orderBy(col("rk")).collect().map(_.getLong(2))
    assert(got.toSeq == Seq(3L, 4L), s"NaN corrupted the buffer: ${got.toSeq}")
    // with room, NaN is kept but ranked last
    val all = TopNByKey.topN(df.coalesce(1), Seq("k"), col("v"), col("id"),
        n = 10, asc = true)
      .orderBy(col("rk")).collect().map(_.getLong(2))
    assert(all.toSeq == Seq(3L, 4L, 2L, 1L))
  }

  test("key columns colliding with helper/output names are rejected") {
    import spark.implicits._
    val df = Seq((1L, 2.0, "a")).toDF("id", "score", "rk")
    // "rk" and "id" are both reserved output names — an un-guarded run
    // would emit duplicate columns
    for (key <- Seq("rk", "id")) {
      val e = intercept[IllegalArgumentException] {
        graft.operators.TopNByKey.topN(df, Seq(key), col("score"), col("id"), 1)
      }
      assert(e.getMessage.contains("reserved"))
    }
  }

  test("result is partitioning-independent") {
    val docs = Tables.documents(spark, sf001)
    def run(p: Int): Set[(String, Int, Long)] =
      TopNByKey.topN(docs.repartition(p), Seq("source"),
          col("n_chars"), col("doc_id"), n = 7, asc = false)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(1) == run(8))
  }
}
