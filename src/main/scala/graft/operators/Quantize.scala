package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage-scale path for
  * embedding columns: a float32 vector becomes (scale: float,
  * array<tinyint>) at ~4× compression, which at 100 TB of embeddings is
  * the difference between 100 TB and 25 TB scanned per ANN sweep.
  *
  * Symmetric per-vector scheme (the common faiss/GGML-style SQ8 shape):
  * scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127],
  * dequantized x̂_i = q_i · scale. All map-side column expressions — no
  * UDF, no shuffle; quantized vectors feed the same distance/top-k
  * operators after `dequantize`. NOTE: the higher-order-function forms
  * here are CodegenFallback (Spark interprets the per-element lambda),
  * which is invisible on pruned candidate sets but dominates full
  * scans at wide dims — full-scan hot paths should use the fused
  * [[roundTripL2]] (codegen, bitwise-identical).
  */
object Quantize {

  /** Per-vector scale (double): max|x| / 127, guarded so an all-zero
    * vector maps to q = 0 rather than dividing by zero. The max runs in
    * float (exact — no arithmetic, just comparisons), the division in
    * double; both promote identically in DuckDB, keeping the oracle
    * bitwise.
    */
  def int8Scale(emb: Column): Column =
    greatest(
      aggregate(emb, lit(0.0f), (a, x) => greatest(a, abs(x))),
      lit(Float.MinPositiveValue)).cast("double") / 127.0

  /** Quantize to array<tinyint> given the vector's (double) scale. */
  def int8(emb: Column, scale: Column): Column =
    transform(emb, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Dequantize back to array<float>: double multiply, float storage. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** df + (scaleCol, qCol) columns for an array<float> embedding. */
  def withInt8(df: DataFrame, embCol: String,
      scaleCol: String = "q_scale", qCol: String = "q_emb"): DataFrame =
    df.withColumn(scaleCol, int8Scale(col(embCol)))
      .withColumn(qCol, int8(col(embCol), col(scaleCol)))

  /** Fused quantize→dequantize→squared-L2: bitwise equal to
    * `Vec.squaredL2(dequantize(int8(emb, int8Scale(emb)), int8Scale(
    * emb)), ref)` but one compiled pass instead of three interpreted
    * HOF passes — see [[graft.functions.SqRoundTripL2]] for why the
    * HOF chain became the top catalog entry at the D=768 cell.
    */
  def roundTripL2(emb: Column, ref: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.SqRoundTripL2(
        org.apache.spark.sql.GraftSqlBridge.expression(emb),
        org.apache.spark.sql.GraftSqlBridge.expression(ref)))

  /** Fused dequantize→squared-L2 over STORED codes (the IvfSq pruned
    * scan's hot step): bitwise equal to
    * `Vec.squaredL2(dequantize(codes, scale), ref)` in one compiled
    * pass — see [[graft.functions.SqCodesL2]].
    */
  def codesL2(codes: Column, scale: Column, ref: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.SqCodesL2(
        org.apache.spark.sql.GraftSqlBridge.expression(codes),
        org.apache.spark.sql.GraftSqlBridge.expression(scale),
        org.apache.spark.sql.GraftSqlBridge.expression(ref)))
}
