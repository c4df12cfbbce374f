package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Number of significant bits of a non-negative long: position of the
  * highest set bit (`64 - numberOfLeadingZeros`), with 0 for input 0 —
  * i.e. `floor(log2(v)) + 1` computed in integer arithmetic.
  *
  * This is the portable integer log2 the sketch operators ([[graft.operators.Hll]]
  * register rank, [[graft.operators.QuantileSketch]] bucket exponent) are
  * built on: DuckDB reproduces it exactly as `length(bin(v))` (binary
  * string without leading zeros; `bin(0) = '0'` is special-cased on both
  * sides), whereas a float `log2` is off by one whole bucket whenever the
  * libm result lands a ulp below an exact power of two. Zero allocations,
  * single intrinsic in codegen — same treatment [[Md5Long60]] gives the
  * hash path.
  */
case class BitLength64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bit_length64 expects a bigint input, got ${child.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    64 - java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"64 - java.lang.Long.numberOfLeadingZeros($c)")

  override protected def withNewChildInternal(newChild: Expression): BitLength64 =
    copy(child = newChild)
}

object BitLength64 {

  /** Column form — the wrapper every consumer routes through. */
  def col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BitLength64(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
