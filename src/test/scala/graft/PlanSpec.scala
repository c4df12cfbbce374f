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
}
