package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted/two-phase aggregation equals the direct form. */
class SkewSpec extends SparkSpec {

  test("two-phase count-distinct equals countDistinct") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy(col("l_returnflag").as("__key"))
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(
      li, col("l_returnflag"), col("l_partkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
  }

  test("two-phase count-distinct keeps all-NULL keys with count 0") {
    import spark.implicits._
    val df = Seq(("a", None: Option[Int]), ("a", None), ("b", Some(1)))
      .toDF("k", "v")
    val direct = df.groupBy(col("k").as("__key"))
      .agg(countDistinct(col("v")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
    assert(twoPhase("a") == 0L)
  }

  test("two-phase count-distinct counts NULL keys' non-null values") {
    // groupBy groups NULL keys together, but a null-unsafe re-attach join
    // would never match NULL = NULL and report 0 — must use <=>
    import spark.implicits._
    val df = Seq((Some("a"), Some(1)), (None: Option[String], Some(1)),
      (None, Some(2)), (None, None: Option[Int]))
      .toDF("k", "v")
    val direct = df.groupBy(col("k").as("__key"))
      .agg(countDistinct(col("v")).as("n_distinct"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(df, col("k"), col("v"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
    assert(twoPhase(None) == 2L)
  }

  test("salted collect_set equals direct collect_set") {
    val li = Tables.lineitem(spark, sf0001).where(col("l_suppkey") < 4)
    val direct = li.groupBy(col("l_suppkey").as("__key"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("values"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectSet(
      li, col("l_suppkey"), col("l_partkey"), nSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct)
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key — the shape AQE skew-join or
    // manual salting exists for
    val left = (0 until 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 999L, i.toLong)
    }.toDF("k", "row_id")
    val right = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k"))
      .select("k", "row_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k",
      saltBy = col("row_id"), nSalts = 8)
      .select("k", "row_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    // the salt actually spreads the hot key over multiple salt values
    val spread = left.where(col("k") === 999L)
      .withColumn("s", pmod(xxhash64(col("row_id")), lit(8)))
      .select("s").distinct().count()
    assert(spread > 4, s"hot key spread over only $spread salts")
    // the injected helper column must not clobber a caller's __salt
    intercept[IllegalArgumentException](Skew.saltedJoin(
      left.withColumn("__salt", lit(0)), right, "k", col("row_id")))
    intercept[IllegalArgumentException](Skew.saltedJoin(
      left, right.withColumn("__salt", lit(0)), "k", col("row_id")))
  }
}
