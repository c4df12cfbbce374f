package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared-L2 between the SQ8 ROUND-TRIP of `left` and the
  * already-dequantized reference `right` — the whole
  * quantize→dequantize→distance chain of `operators.Quantize` fused
  * into one compiled per-row pass.
  *
  * Why: the chain's column form is three higher-order functions
  * (`aggregate` for the scale, `transform` ×2 for quantize/dequantize),
  * and Spark HOFs are CodegenFallback — per-element interpreted lambda
  * evaluation. Invisible at D=64 (0.43 s for the sf0.1 full scan), it
  * became the top catalog entry at the D=768 cell: 43.6 s, ~100× the
  * floor, for 3 interpreted passes × 768 elements × 500k rows. This
  * expression runs the identical arithmetic in two tight primitive
  * loops (scale pass, distance pass) inside whole-stage codegen.
  *
  * Bit-parity contract (gated in QuantizeSpec beside the overlap gate):
  * identical to `Vec.squaredL2(Quantize.dequantize(Quantize.int8(x, s),
  * s), qe)` with `s = Quantize.int8Scale(x)` —
  *   scale: float max of |x_i| left-to-right, floored at
  *     Float.MinPositiveValue, widened to double, / 127.0;
  *   quantize: round(x_i.toDouble / scale) with Spark `round`'s
  *     HALF_UP-on-shortest-decimal semantics (fast floor(|v|+0.5) path
  *     with an exact BigDecimal fallback inside the ±1e-9 tie zone —
  *     see [[SqRoundTripL2.roundHalfUp]]), cast to byte;
  *   dequantize: (q.toDouble * scale).toFloat;
  *   distance: left-to-right double fold of (deq − qe)², exactly
  *     [[SquaredL2]]'s order.
  * Null semantics mirror the chain: null array → null, length mismatch
  * → null, null element → null.
  *
  * The stored-code scale path (IvfSq pruned scans) is unaffected — this
  * fuses the from-floats form the full-scan catalog query measures.
  */
case class SqRoundTripL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_roundtrip_l2 expects two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqRoundTripL2.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("rtDist")
      // one static call per row; the loops live in compiled Scala and
      // JIT-inline — the codegen win over the HOF form is not the call
      // shape but never touching an interpreted lambda per element
      s"""
         |java.lang.Double $d = graft.functions.SqRoundTripL2.dist($a, $b);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqRoundTripL2 =
    copy(left = newLeft, right = newRight)
}

/** Native asymmetric SQ8 distance over STORED codes: squared-L2
  * between the dequantized `(codes, scale)` row and the float
  * reference `ref` — `Vec.squaredL2(Quantize.dequantize(codes, scale),
  * ref)` fused into one compiled pass. Same motivation as
  * [[SqRoundTripL2]] (Spark HOF `transform` is CodegenFallback), for
  * the pruned-scan path that reads int8 codes off disk (IvfSq): the
  * per-candidate dequantize was the interpreted step behind
  * ann_ivfsq_topk's 5.9× growth at the D=768 cell.
  *
  * Bit-parity contract (QuantizeSpec): dequantize is
  * `(c_i.toDouble * scale).toFloat`, distance is the left-to-right
  * double fold of [[SquaredL2]]. Null semantics mirror the chain:
  * null input → null, length mismatch → null, null element → null.
  */
case class SqCodesL2(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.ByteType, _), DoubleType,
          ArrayType(FloatType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_codes_l2 expects (array<tinyint>, double, array<float>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(c: Any, s: Any, r: Any): Any =
    SqCodesL2.dist(c.asInstanceOf[ArrayData], s.asInstanceOf[Double],
      r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, r) => {
      val d = ctx.freshName("adcDist")
      s"""
         |java.lang.Double $d = graft.functions.SqCodesL2.dist($c, $s, $r);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SqCodesL2 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SqCodesL2 {
  /** Null (boxed) on length mismatch or null element. */
  def dist(codes: ArrayData, scale: Double,
      ref: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    if (n != ref.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (codes.isNullAt(i) || ref.isNullAt(i)) return null
      val deq = (codes.getByte(i).toDouble * scale).toFloat
      val d = deq.toDouble - ref.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

object SqRoundTripL2 {

  /** Spark `round(_, 0)` on DoubleType rounds the value's SHORTEST
    * DECIMAL representation half-up (away from zero at ties) via
    * BigDecimal. `Math.floor(|v| + 0.5)` agrees everywhere except when
    * |v|'s fractional part sits within ~1e-15 of 0.5, where the binary
    * add can cross the boundary the decimal representation doesn't —
    * so values inside a ±1e-9 guard band take the exact BigDecimal
    * path (~2e-9 of uniform inputs; the band is 10⁶× wider than the
    * error it guards, and both paths agree strictly outside ±1e-15).
    */
  def roundHalfUp(v: Double): Double = {
    val av = Math.abs(v)
    val fr = av - Math.floor(av)
    val r =
      if (Math.abs(fr - 0.5) < 1e-9)
        java.math.BigDecimal.valueOf(av)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      else Math.floor(av + 0.5)
    if (v < 0) -r else r
  }

  /** Null (as boxed null) on length mismatch or null element — the
    * HOF chain's semantics. NaN inputs propagate through max/divide
    * exactly like `greatest`/`abs` do (NaN is greatest).
    */
  def dist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    // pass 1: scale = max|x| (float, left-to-right like the aggregate
    // fold; NaN sticks — Spark's greatest ranks NaN above everything)
    var m = 0.0f
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val ax = Math.abs(a.getFloat(i))
      if (ax > m || java.lang.Float.isNaN(ax)) m = ax
      i += 1
    }
    if (m < java.lang.Float.MIN_VALUE) m = java.lang.Float.MIN_VALUE
    val scale = m.toDouble / 127.0
    // pass 2: quantize, dequantize, accumulate (deq − ref)² in double
    var s = 0.0
    i = 0
    while (i < n) {
      if (b.isNullAt(i)) return null
      val q = roundHalfUp(a.getFloat(i).toDouble / scale).toByte
      val deq = (q.toDouble * scale).toFloat
      val d = deq.toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
