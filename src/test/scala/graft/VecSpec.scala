package graft

import org.apache.spark.sql.functions._
import graft.functions.Vec

/** Parity + behavior of the native SquaredL2 expression vs the HOF form,
  * including a micro-benchmark (informational, printed not asserted).
  */
class VecSpec extends SparkSpec {

  test("native SquaredL2 is bitwise identical to the HOF form") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        Vec.squaredL2(col("embedding"), col("qe")).as("native"),
        Vec.squaredL2Hof(col("embedding"), col("qe")).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(both.length == 500)
  }

  test("null and mismatch semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f))),   // equal → 0
      (Some(Seq(1f, 2f)), Some(Seq(1f))),       // length mismatch → null
      (None, Some(Seq(1f, 2f)))                 // null input → null
    ).toDF("a", "b")
      .select(Vec.squaredL2(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("d"))
      .collect()
    assert(df(0).getDouble(0) == 0.0)
    assert(df(1).isNullAt(0))
    assert(df(2).isNullAt(0))
  }

  test("interpreted (non-codegen) eval path matches too") {
    import spark.implicits._
    val a = Array(1.5f, -2.25f, 3f)
    val b = Array(0.5f, 0.75f, -1f)
    val expected = a.zip(b).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d
    }.sum
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(Vec.squaredL2(col("a").cast("array<float>"),
        col("b").cast("array<float>")).as("d"))
      .collect()(0).getDouble(0)
    assert(got == expected)
  }

  test("VecMean aggregator matches the exploded-form centroid update") {
    import spark.implicits._
    val byAgg = Tables.embeddings(spark, sf0001)
      .groupBy(col("label"))
      .agg(udaf(graft.functions.VecMean).apply(col("embedding")).as("mean_emb"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val exploded = Tables.embeddings(spark, sf0001)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("val").cast("double")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    byAgg.foreach { case (label, mean) =>
      mean.zip(exploded(label)).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-5, s"label=$label $a vs $e")
      }
    }
    assert(byAgg.nonEmpty)
  }

  test("SQL function registration: squared_l2 and dot_product callable from SQL") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT squared_l2(embedding, embedding) AS z,
        |       dot_product(embedding, embedding) AS n
        |FROM emb_sql WHERE vec_id = 3""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) > 0.0)
  }

  test("micro-benchmark: native vs HOF (informational)") {
    // 2000 × 2000 self cross join at sf0.1 = 4M distance computations of
    // dim 64 per run — enough work to dominate job overhead
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1").cache()
    emb.count()
    val right = broadcast(emb.select(col("embedding").as("qe")))
    def run(d: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      (1 to 3).foreach { _ =>
        emb.crossJoin(right)
          .select(sum(d(col("embedding"))).as("s")).collect()
      }
      (System.nanoTime() - t0) / 1e9
    }
    run(e => Vec.squaredL2(e, col("qe"))) // warm-up JIT
    val tNative = run(e => Vec.squaredL2(e, col("qe")))
    val tHof = run(e => Vec.squaredL2Hof(e, col("qe")))
    info(f"native=${tNative}%.2fs hof=${tHof}%.2fs speedup=${tHof / tNative}%.1fx")
    assert(tNative > 0 && tHof > 0)
  }
}
