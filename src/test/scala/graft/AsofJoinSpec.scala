package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join semantics pinned against a naive per-row reference
  * computation (DuckDB ASOF JOIN parity is the `events_asof_click`
  * oracle query; these are the operator-level invariants).
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 100L, "l-a"), (1L, 200L, "l-b"), (1L, 50L, "l-early"),
    (2L, 100L, "l-c"), (3L, 10L, "l-none")
  ).toDF("k", "t", "lval")

  private lazy val right = Seq(
    (1L, 80L, "r1"), (1L, 100L, "r2"), (1L, 150L, "r3"),
    (2L, 40L, "r4"), (4L, 5L, "r5")
  ).toDF("k", "t", "rval")

  test("greatest right time <= left time, inclusive at equality") {
    val got = AsofJoin.asof(left, right, "k", "t")
      .select("k", "t", "lval", "t_right", "rval")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got == Set(
      (1L, 100L, "l-a", 100L, "r2"),   // equal time matches (inclusive)
      (1L, 200L, "l-b", 150L, "r3"),   // greatest prior, not first
      (2L, 100L, "l-c", 40L, "r4")))
    // (1, 50) has no prior right? 80 > 50 → dropped; (3, 10) no key match
  }

  test("inner drops unmatched left rows; left join keeps them with nulls") {
    assert(AsofJoin.asof(left, right, "k", "t").count() == 3)
    val outer = AsofJoin.asof(left, right, "k", "t", inner = false)
    assert(outer.count() == 5)
    val misses = outer.where(col("rval").isNull)
      .select("lval").collect().map(_.getString(0)).toSet
    assert(misses == Set("l-early", "l-none"))
  }

  test("parity with a naive per-row max-prior computation on events") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"))
    val l = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("k"), col("ms").as("t"))
    val r = ev.where(col("event_type") === "click")
      .groupBy(col("user_id").as("k"), col("ms").as("t"))
      .agg(max(col("event_id")).as("cid"))
    val got = AsofJoin.asof(l, r, "k", "t")
      .select("pid", "cid").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap

    val rights = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val naive = l.collect().flatMap { x =>
      val (pid, k, t) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val prior = rights.filter(rr => rr._1 == k && rr._2 <= t)
      if (prior.isEmpty) None else Some(pid -> prior.maxBy(_._2)._3)
    }.toMap
    assert(got == naive)
  }

  test("clashing right column names get the suffix; left names win") {
    val l2 = Seq((1L, 100L, "L")).toDF("k", "t", "v")
    val r2 = Seq((1L, 90L, "R")).toDF("k", "t", "v")
    val out = AsofJoin.asof(l2, r2, "k", "t")
    assert(out.columns.toSeq == Seq("k", "t", "v", "t_right", "v_right"))
    val row = out.collect().head
    assert(row.getString(2) == "L" && row.getString(4) == "R")
  }
}
