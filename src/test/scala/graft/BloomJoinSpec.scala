package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom pre-filtered joins are exact (equal the plain semi/anti join)
  * and the pre-filter actually rejects the non-matching majority.
  */
class BloomJoinSpec extends SparkSpec {

  private def urgentKeys = Tables.orders(spark, sf0001)
    .where(col("o_orderpriority") === "1-URGENT" &&
      col("o_totalprice") > 280000)
    .select(col("o_orderkey"))

  test("semi equals plain left_semi join (long keys)") {
    val li = Tables.lineitem(spark, sf0001)
    val expected = li
      .join(urgentKeys.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = BloomJoin.semi(li, "l_orderkey", urgentKeys, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("anti equals plain left_anti join and partitions the input exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val expected = li
      .join(urgentKeys.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_anti")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = BloomJoin.anti(li, "l_orderkey", urgentKeys, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
    // semi + anti partition the table: no loss, no overlap
    val semiN = BloomJoin.semi(li, "l_orderkey", urgentKeys, "o_orderkey").count()
    val antiN = BloomJoin.anti(li, "l_orderkey", urgentKeys, "o_orderkey").count()
    assert(semiN + antiN == li.count())
  }

  test("string keys probe as UTF-8") {
    import spark.implicits._
    val large = Seq("a", "b", "c", "d", "a").toDF("k")
    val keys = Seq("a", "c").toDF("k2")
    val semi = BloomJoin.semi(large, "k", keys, "k2")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(semi == Seq("a", "a", "c"))
    val anti = BloomJoin.anti(large, "k", keys, "k2")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(anti == Seq("b", "d"))
  }

  test("null probe keys never match: dropped by semi, kept by anti") {
    import spark.implicits._
    val large = Seq(Some(1L), None, Some(2L), None).toDF("k")
    val keys = Seq(1L, 3L).toDF("k2")
    assert(BloomJoin.semi(large, "k", keys, "k2")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    val anti = BloomJoin.anti(large, "k", keys, "k2")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(anti.count(_.isEmpty) == 2)
    assert(anti.flatten.toSeq.sorted == Seq(2L))
  }

  test("all-null key column behaves as an empty key set (ADVICE r9)") {
    import spark.implicits._
    val large = Seq(1L, 2L, 3L).toDF("k")
    val keys = Seq(Option.empty[Long], Option.empty[Long]).toDF("k2")
    // non-empty relation, zero insertable keys: both the count() path
    // and the expectedItems-hint path must take the empty-filter branch
    // instead of NPEing in stat.bloomFilter's null agg buffer
    assert(BloomJoin.semi(large, "k", keys, "k2").count() == 0)
    assert(BloomJoin.anti(large, "k", keys, "k2").count() == 3)
    assert(BloomJoin.semi(large, "k", keys, "k2", expectedItems = 5L)
      .count() == 0)
  }

  test("empty key set: semi yields nothing, anti yields everything") {
    import spark.implicits._
    val large = Seq(1L, 2L, 3L).toDF("k")
    val keys = Seq.empty[Long].toDF("k2")
    assert(BloomJoin.semi(large, "k", keys, "k2").count() == 0)
    assert(BloomJoin.anti(large, "k", keys, "k2").count() == 3)
  }

  test("empty probe side: both joins yield empty, union schema intact") {
    import spark.implicits._
    val large = Seq.empty[Long].toDF("k")
    val keys = Seq(1L, 2L).toDF("k2")
    assert(BloomJoin.semi(large, "k", keys, "k2").count() == 0)
    val anti = BloomJoin.anti(large, "k", keys, "k2")
    assert(anti.count() == 0 && anti.columns.toSeq == Seq("k"))
  }

  test("pre-filter rejects the vast majority of a disjoint probe side") {
    import spark.implicits._
    val large = spark.range(0, 100000).toDF("k") // 0..99999
    val keys = spark.range(200000, 201000).toDF("k2") // fully disjoint
    val bf = BloomJoin.build(keys, "k2")
    val passed = large.where(BloomJoin.mightContain(large, "k", bf)).count()
    // fpp=0.01 → expect ~1000 false positives of 100k; allow 3×
    assert(passed < 3000, s"bloom passed $passed of 100000 disjoint keys")
    assert(BloomJoin.semi(large, "k", keys, "k2").count() == 0)
    assert(BloomJoin.anti(large, "k", keys, "k2").count() == 100000)
  }
}
