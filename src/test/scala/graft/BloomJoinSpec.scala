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

  test("codegen probe expression is bit-parity with the UDF form " +
      "(long + string, nulls and edge values)") {
    import spark.implicits._
    // longs: edges, negatives, nulls interleaved with members
    val longRows = Seq[java.lang.Long](0L, 1L, -1L, Long.MaxValue,
      Long.MinValue, null, 42L, 43L, null, 50L, 100L, 1234567890123L)
    val large = longRows.toDF("k")
    val keys = Seq(0L, -1L, Long.MaxValue, 42L, 50L).toDF("k2")
    val bf = BloomJoin.build(keys, "k2")
    val expr = large.where(BloomJoin.mightContain(large, "k", bf))
      .collect().map(r => Option(r.get(0))).toSeq
    val viaUdf = large.where(BloomJoin.mightContainUdf(large, "k", bf))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(expr == viaUdf, s"long probe forms disagree: $expr vs $viaUdf")
    assert(expr.nonEmpty && !expr.contains(None),
      "null keys must never match")

    // strings: empty, unicode, null
    val strRows = Seq("", "a", "key", "ümläut", null,
      "中文", "miss1", "miss2")
    val largeS = strRows.toDF("k")
    val keysS = Seq("", "key", "ümläut", "中文").toDF("k2")
    val bfS = BloomJoin.build(keysS, "k2")
    val exprS = largeS.where(BloomJoin.mightContain(largeS, "k", bfS))
      .collect().map(r => Option(r.getString(0))).toSeq
    val udfS = largeS.where(BloomJoin.mightContainUdf(largeS, "k", bfS))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(exprS == udfS, s"string probe forms disagree: $exprS vs $udfS")
    assert(exprS.contains(Some("")) && exprS.contains(Some("中文")),
      "UTF-8 probe must match the insert path for empty and multibyte strings")
  }

  test("probe predicate stays native: no ScalaUDF in the filter plan") {
    import spark.implicits._
    val large = spark.range(0, 1000).toDF("k")
    val keys = spark.range(0, 100).toDF("k2")
    val bf = BloomJoin.build(keys, "k2")
    val plan = large.where(BloomJoin.mightContain(large, "k", bf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"probe fell back to a UDF:\n${plan.take(600)}")
    assert(plan.toLowerCase.contains("bloomprobe"),
      s"native probe expression missing from the plan:\n${plan.take(600)}")
    // and the filter participates in whole-stage codegen: the compact
    // plan prefixes codegen'd operators with `*(stageId)` — the Filter
    // line itself must carry the marker
    val filterLines = plan.split("\n").filter(_.contains("Filter"))
    assert(filterLines.exists(_.trim.stripPrefix("+- ").startsWith("*(")),
      s"probe filter not inside a codegen span:\n${plan.take(600)}")
  }
}
