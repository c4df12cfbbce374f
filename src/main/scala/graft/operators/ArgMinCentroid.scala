package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for the distributed full-assignment pass
  * (J2/J3): nearest-centroid id of an `array<float>` embedding under a
  * broadcast [[KMeans.AssignerHolder]] — the codegen replacement for
  * the boxed `Seq[Float]` UDF that used to sit on `ivf_build`'s single
  * most row-intensive stage (VERDICT r9 #2).
  *
  * Why an expression and not a UDF: the Scala-UDF path deserializes
  * every embedding to a boxed `Seq[Float]` (one `java.lang.Float` per
  * element) and then re-unboxes with `toArray` — per-row allocation
  * proportional to the dimension on every corpus row. Here the input
  * stays Tungsten `ArrayData`; `toFloatArray()` on the unsafe format
  * is one primitive `Platform.copyMemory` into a flat `float[]`, and
  * the surrounding scan/project stages stay in whole-stage codegen
  * (same treatment [[graft.functions.SquaredL2]] gives the distance
  * kernel). The argmin loop itself is unchanged — the SAME
  * `AssignerHolder.assign` (flat/hierarchical dispatch included), so
  * assignments are bitwise-identical to the UDF path (KMeansSpec).
  *
  * Null semantics: null embedding → null label (the callers' build and
  * append paths reject null embeddings with raise_error before this
  * expression runs). Null ELEMENTS throw via the explicit scan in
  * [[idx]], matching the UDF's `Seq[Float]` decoder — the scan is
  * REQUIRED, not defensive: `UnsafeArrayData.toFloatArray` is a raw
  * memory copy that IGNORES the null bitmap (a null element would
  * silently read as 0.0f and assign a plausible wrong centroid), and
  * an embedding with null components has no geometry and must fail
  * loudly, not silently assign.
  */
case class ArgMinCentroid(child: Expression,
    bc: Broadcast[KMeans.AssignerHolder]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_centroid expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  /** Deserialized once per task instance; the holder's own transient
    * lazy assigner builds once per executor per broadcast.
    */
  @transient private lazy val holder = bc.value

  /** The per-row kernel, also the codegen entry point (the generated
    * code calls this instance method through an `addReferenceObj`
    * handle — the loop is compiled Scala over primitive arrays either
    * way, so interpreted and codegen paths cannot diverge).
    */
  def idx(a: ArrayData): Int = {
    val n = a.numElements()
    var i = 0
    while (i < n) { // null-bit scan; see the class note — copy skips it
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"argmin_centroid: null element at index $i of the embedding")
      i += 1
    }
    holder.assign(a.toFloatArray())._1
  }

  override protected def nullSafeEval(input: Any): Any =
    idx(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminCentroid", this,
      classOf[ArgMinCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.idx($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArgMinCentroid = copy(child = newChild)
}
