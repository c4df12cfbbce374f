package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression for distributed probe routing (J5 on the
  * map side): the top-`nProbe` centroid ids of an `array<float>` query
  * embedding under a broadcast [[KMeans.ProbeRouter]] — the codegen
  * replacement for the boxed `Seq[Float]` probe UDF on
  * [[Ivf.annJoin]]'s query side. In an ANN join the "query side" is a
  * full corpus (hard negatives, kNN labeling, semantic decontam), so
  * this is a per-corpus-row kernel, exactly the path where the
  * Scala-UDF converter's one-boxed-`java.lang.Float`-per-element
  * deserialization costs dimension × rows (the same argument, and the
  * same fix, as [[ArgMinCentroid]] on the build assignment pass).
  *
  * The input stays Tungsten `ArrayData` (`toFloatArray()` is one
  * primitive copy), the routing loop is the SAME `ProbeRouter.topN`
  * (flat bounded-insertion / hierarchical dispatch included) so probe
  * sets are bitwise-identical to the UDF form (IvfSpec parity gate),
  * and the result returns as an `UnsafeArrayData` over a primitive
  * int[] — no element boxing in either direction.
  *
  * Null semantics: null embedding → null (annJoin's map-side
  * raise_error guard rejects null/wrong-dimension embeddings BEFORE
  * this expression runs). Null ELEMENTS throw via the explicit scan —
  * required, not defensive: `toFloatArray` ignores the null bitmap, so
  * a null component would silently read as 0.0f and route to a
  * plausible wrong cell.
  */
case class RouteTopN(child: Expression,
    bc: Broadcast[KMeans.ProbeRouter], nProbe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"route_topn expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val router = bc.value

  /** Per-row kernel, also the codegen entry point (generated code
    * calls this instance method through an `addReferenceObj` handle —
    * compiled Scala over primitive arrays either way, so interpreted
    * and codegen paths cannot diverge).
    */
  def route(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) { // null-bit scan; see the class note — copy skips it
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"route_topn: null element at index $i of the query embedding")
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(router.topN(a.toFloatArray(), nProbe))
  }

  override protected def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("routeTopN", this, classOf[RouteTopN].getName)
    defineCodeGen(ctx, ev, c => s"$ref.route($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RouteTopN =
    copy(child = newChild)
}

object RouteTopN {

  /** Column form — the wrapper [[Ivf.annJoin]] routes through. */
  def col(c: org.apache.spark.sql.Column, bc: Broadcast[KMeans.ProbeRouter],
      nProbe: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      RouteTopN(org.apache.spark.sql.GraftSqlBridge.expression(c), bc, nProbe))
}
