package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling both sides of a recurring fact↔fact join
  * into the same bucket layout makes the join exchange-free — the
  * 100 TB answer to "this join runs every day on the same key".
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero exchanges") {
    val warehouse = Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.orders(spark, sf001)
    val customer = Tables.customer(spark, sf001)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.option("path", s"$warehouse/b_orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.option("path", s"$warehouse/b_customer")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the small side being broadcastable at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      val joinPart = plan.substring(0, plan.indexOf("SortMergeJoin"))
      // the join inputs must come straight from the bucketed scans — the
      // only allowed exchange is the one AFTER the join for the groupBy
      val exchangesBeforeJoin = "Exchange".r.findAllIn(joinPart).length
      assert(exchangesBeforeJoin <= 1, // groupBy exchange sits above the join in the plan string
        s"bucketed join still shuffles:\n${plan.take(3000)}")
      assert(plan.contains("Bucketed: true"),
        s"scan not bucketed:\n${plan.take(2000)}")
      // correctness: equals the plain join (rev compared with tolerance —
      // double addition order differs between the bucketed and shuffled
      // plans)
      def byKey(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val got = byKey(joined.collect())
      val expect = byKey(
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("rev"))
          .collect())
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, (n, rev)) =>
        assert(n == expect(k)._1)
        assert(math.abs(rev - expect(k)._2) < 1e-6 * math.abs(rev))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
