package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's md5-derived 60-bit hash:
  * the first 60 bits of md5(utf8(input)) as a non-negative long —
  * bit-identical to `conv(substring(md5(c), 1, 15), 16, 10)` (the first
  * 15 hex digits ARE the first 60 bits) and to DuckDB's
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`, which every
  * md5-based oracle uses.
  *
  * The composed built-in form materializes a 32-char hex string, takes a
  * substring, and re-parses it base-16 — three string allocations per
  * element. On the MinHash signature pass (8 digests per shingle,
  * millions of elements) that allocation rate, not the digest itself,
  * bounds throughput and defeats multi-core scaling (GC-bound). This
  * expression goes digest → bit ops with zero intermediate strings, the
  * same treatment [[SquaredL2]] gives the distance kernel.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Long60.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {

  /** Column form of the expression — the one wrapper every consumer
    * (queries, operators) routes through.
    */
  def col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Md5Long60(org.apache.spark.sql.GraftSqlBridge.expression(c)))

  /** One digest instance per thread — `MessageDigest.getInstance` walks
    * the provider registry per call; `digest()` resets the instance, so
    * reuse is safe.
    */
  private val local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes): big-endian first 8 digest bytes,
    * dropping the low nibble (the 16th hex digit).
    */
  def compute(bytes: Array[Byte]): Long = {
    val d = local.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
