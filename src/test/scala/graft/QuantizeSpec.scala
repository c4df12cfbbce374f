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
