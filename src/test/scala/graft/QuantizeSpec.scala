package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize

/** Int8 scalar quantization invariants: code range, error bound,
  * zero-vector safety, and ANN overlap through the compressed path.
  */
class QuantizeSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf001)

  test("codes stay in [-127, 127]; error bounded by scale/2") {
    val q = Quantize.withInt8(emb, "embedding")
      .withColumn("deq", Quantize.dequantize(col("q_emb"), col("q_scale")))
    val bad = q.where(exists(col("q_emb"),
      v => abs(v.cast("int")) > 127)).count()
    assert(bad == 0, s"$bad vectors with out-of-range codes")
    // |x - q·s| <= s/2 + float-storage rounding slack
    val overs = q.where(
      aggregate(zip_with(col("embedding"), col("deq"),
          (x, d) => abs(x.cast("double") - d.cast("double"))),
        lit(0.0), (a, e) => greatest(a, e)) >
        col("q_scale") * 0.5 * 1.001).count()
    assert(overs == 0, s"$overs vectors exceed the scale/2 error bound")
  }

  test("zero vector quantizes to zero codes without dividing by zero") {
    import spark.implicits._
    val df = Seq((0L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val row = Quantize.withInt8(df, "embedding")
      .select("q_emb").collect().head.getSeq[Byte](0)
    assert(row == Seq(0.toByte, 0.toByte, 0.toByte))
  }

  test("quantized ANN top-10 overlaps exact top-10") {
    val exact = queries.VectorQueries.knnExact(spark, sf001, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val quant = queries.VectorQueries.quantizedTopK(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact & quant).size
    assert(overlap >= 7, s"quantized/exact top-10 overlap $overlap < 7")
  }

  test("IVF-SQ8: probe-all equals flat asymmetric SQ8; recall floor holds") {
    val idx = queries.IndexQueries.index(spark, sf0001)
    val codes = queries.IndexQueries.sqCodesPath(spark, sf0001)
    val q = Tables.embeddings(spark, sf0001).where(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    // flat asymmetric reference: float query vs dequantized rows
    val flat = Quantize.withInt8(Tables.embeddings(spark, sf0001), "embedding")
      .withColumn("distance", graft.functions.Vec.squaredL2(
        Quantize.dequantize(col("q_emb"), col("q_scale")), lit(q)))
      .orderBy(col("distance").asc_nulls_last, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSeq
    val probeAll = graft.operators.IvfSq.search(spark, idx, codes, q, 10, 10000)
      .select("external_id").collect().map(_.getLong(0)).toSeq
    assert(probeAll == flat, "probe-all IVF-SQ8 diverges from flat SQ8")
    // coded dataset is complete and keeps the layout
    val df = spark.read.parquet(codes)
    assert(df.count() == Tables.embeddings(spark, sf0001).count())
    assert(df.columns.toSet ==
      Set("shard_id", "centroid_id", "vec_id", "q_scale", "q_emb"))
    // default-probe recall vs exact
    val exact = queries.VectorQueries.knnExact(spark, sf0001, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val got = graft.operators.IvfSq.search(spark, idx, codes, q, 10, 20)
      .select("external_id").collect().map(_.getLong(0)).toSet
    val recall = (got & exact).size / 10.0
    assert(recall >= 0.5, s"IVF-SQ8 recall@10 = $recall")
  }

  test("fused roundTripL2 is bitwise equal to the HOF chain " +
      "(random dims, ties, zeros, nulls, length mismatch)") {
    import spark.implicits._
    // random vectors at three widths + adversarial rows: an all-zero
    // vector (MinPositiveValue scale guard), constructed exact-tie
    // quantization points (x/s lands on k.5 — the HALF_UP boundary the
    // fast floor(|v|+0.5) path must hand to BigDecimal), and huge/tiny
    // magnitudes. The reference q vector is the HOF-dequantized row 0.
    val rnd = new scala.util.Random(42)
    def vec(d: Int): Seq[Float] = Seq.fill(d)((rnd.nextFloat() - 0.5f) * 4f)
    // scale of a vector whose max|x| is 127.0f is exactly 1.0, so
    // elements k + 0.5 quantize on the exact tie for every integer k
    val tie = Seq(127.0f, 2.5f, -2.5f, 0.5f, -0.5f, 63.5f, -63.5f, 1.5f)
    val rows: Seq[(Long, Seq[Float])] =
      (0L until 200L).map(i => i -> vec(7)) ++
        (200L until 400L).map(i => i -> vec(64)) ++
        (400L until 500L).map(i => i -> vec(768)) ++
        Seq(9000L -> Seq.fill(7)(0f), 9001L -> tie.take(7),
          9002L -> vec(7).map(_ * 1e20f), 9003L -> vec(7).map(_ * 1e-20f))
    def cmp(df: org.apache.spark.sql.DataFrame, refSeq: Seq[Float]): Unit = {
      val ref = refSeq.toArray
      val hof = Quantize.withInt8(df, "embedding")
        .withColumn("d", graft.functions.Vec.squaredL2(
          Quantize.dequantize(col("q_emb"), col("q_scale")), lit(ref)))
        .select("vec_id", "d").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val fused = df
        .withColumn("d", Quantize.roundTripL2(col("embedding"), lit(ref)))
        .select("vec_id", "d").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(hof.keySet == fused.keySet)
      hof.foreach { case (id, v) =>
        // bitwise: compare raw long bits, not ==, so -0.0/0.0 and any
        // ulp drift fail loudly
        assert(v.map(java.lang.Double.doubleToRawLongBits) ==
          fused(id).map(java.lang.Double.doubleToRawLongBits),
          s"vec_id=$id hof=$v fused=${fused(id)}")
      }
    }
    for (d <- Seq(7, 64, 768)) {
      val sub = rows.filter(_._2.length == d)
      val df = sub.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      cmp(df, sub.head._2.map(x => x)) // vs an arbitrary same-width ref
      cmp(df, Array.fill(d)(0f).toSeq)         // vs the zero ref
    }
    // length mismatch and null element → null from both forms
    val odd = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val mm = odd.withColumn("d",
        Quantize.roundTripL2(col("embedding"), lit(Array(1f, 2f, 3f))))
      .orderBy("vec_id").select("d").collect()
    assert(!mm(0).isNullAt(0) && mm(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT 1L AS vec_id, array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS embedding")
    assert(withNullElem.withColumn("d",
        Quantize.roundTripL2(col("embedding"),
          lit(Array(1f, 2f)))).select("d").head().isNullAt(0))
  }

  test("fused codesL2 is bitwise equal to dequantize+squaredL2 " +
      "over stored codes") {
    import spark.implicits._
    val ref = emb.where(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Float](0).toArray
    val coded = Quantize.withInt8(emb, "embedding")
    val hof = coded.withColumn("d", graft.functions.Vec.squaredL2(
        Quantize.dequantize(col("q_emb"), col("q_scale")), lit(ref)))
      .select("vec_id", "d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = coded.withColumn("d",
        Quantize.codesL2(col("q_emb"), col("q_scale"), lit(ref)))
      .select("vec_id", "d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof.keySet == fused.keySet && hof.nonEmpty)
    hof.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(fused(id)),
        s"vec_id=$id hof=$v fused=${fused(id)}")
    }
    // mismatched width → null (the zip_with-padding semantics)
    val mm = coded.limit(1).withColumn("d",
      Quantize.codesL2(col("q_emb"), col("q_scale"), lit(ref ++ ref)))
      .select("d").head()
    assert(mm.isNullAt(0))
  }

  test("quantization is deterministic across partitionings") {
    val a = Quantize.withInt8(emb, "embedding")
      .select("vec_id", "q_emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val b = Quantize.withInt8(emb.repartition(13), "embedding")
      .select("vec_id", "q_emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(a == b)
  }
}
