package graft

import org.apache.spark.sql.functions._
import graft.operators.Pushdown

/** Unit gates for the [[Pushdown]] chunked-IN helper (the engine-wide
  * guard against the fatal deep-Or-tree pushdown — SCALE.md round 8).
  */
class PushdownSpec extends SparkSpec {

  test("chunking covers every value exactly once, results identical") {
    import spark.implicits._
    val df = spark.range(1000).toDF("id")
    val values = (0L until 600L by 2L).toSeq // 300 values
    val chunked = Pushdown.inChunks(values, chunk = 128)(
      vs => df.where(col("id").isin(vs: _*)))
    val single = df.where(col("id").isin(values: _*))
    assert(chunked.count() == values.size)
    assert(chunked.collect().map(_.getLong(0)).sorted.toSeq ===
      single.collect().map(_.getLong(0)).sorted.toSeq)
    // 300 values / 128 per chunk = 3 union arms
    assert(chunked.queryExecution.logical.collectLeaves().size >= 3)
  }

  test("empty value set degrades to one always-false scan") {
    import spark.implicits._
    val df = spark.range(10).toDF("id")
    val out = Pushdown.inChunks(Seq.empty[Long])(
      vs => df.where(col("id").isin(vs: _*)))
    assert(out.count() == 0L)
  }

  test("sessionChunk clamps to the in-filter threshold and the cap") {
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "10")
      assert(Pushdown.sessionChunk(spark) == 10)
      spark.conf.set(key, "100000")
      assert(Pushdown.sessionChunk(spark) == Pushdown.MaxInLiterals)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
