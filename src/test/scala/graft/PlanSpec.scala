package graft

import graft.queries.Catalog

/** Plan-shape regression gates: the physical properties the 100 TB
  * design depends on (SCALE.md) must survive future edits.
  */
class PlanSpec extends SparkSpec {

  def plan(name: String): String =
    Catalog.all(name).build(spark, sf001).queryExecution.executedPlan.toString

  test("q1: filter pushed to scan + map-side partial aggregation") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
  }

  test("q3/q5: dimension joins broadcast, no shuffle of dims") {
    assert(plan("q3_shipping_priority").contains("BroadcastHashJoin"))
    val p5 = plan("q5_region_revenue")
    assert(p5.contains("BroadcastHashJoin"))
  }

  test("knn: top-k via TakeOrderedAndProject, pruned read schema") {
    val p = plan("knn_exact")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "scan reads more columns than needed")
  }

  test("native distance expression present in knn plan (not HOF)") {
    val p = plan("knn_exact")
    assert(p.contains("squaredl2"), "native SquaredL2 missing from plan")
    assert(!p.contains("zip_with"), "HOF form leaked into the hot path")
  }

  test("semi/anti joins planned as such") {
    assert(plan("order_priority_count").contains("LeftSemi"))
    assert(plan("customers_without_orders").contains("LeftAnti"))
  }

  test("as-of join: one data shuffle (window key), no join explosion") {
    val p = plan("events_asof_click")
    // union + carry-forward window: hash exchange on the key for the
    // window (+ at most the final presentation sort's range exchange) —
    // no BroadcastNestedLoopJoin / CartesianProduct from a naive range
    // join, and no SortMergeJoin: the "join" is the window itself
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"as-of join exploded:\n${p.take(2000)}")
    assert(p.contains("Window"), "carry-forward window missing")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"too many shuffles ($exchanges):\n${p.take(3000)}")
  }
}
