package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe against a broadcast sketch —
  * the native-Expression form of [[graft.operators.BloomJoin]]'s
  * per-row predicate (long keys probe the widened-integral hash,
  * string keys their UTF-8 bytes, matching
  * `stat.bloomFilter`'s insert paths bit-for-bit).
  *
  * Why an Expression and not a `udf(...)`: the probe runs once per row
  * of the LARGE side — the 100 TB scan — and a ScalaUDF pays per-row
  * Long boxing plus catalyst↔Scala converters on exactly that path
  * (the same class of cost [[graft.operators.ArgMinCentroid]] and the
  * Ivf shard remaps removed). Here the generated code calls
  * `mightContainLong` on a per-partition-resolved filter reference
  * with the primitive long straight out of the row; the string form
  * hands the UTF8String's bytes to `mightContainBinary` without ever
  * materializing a java.lang.String. The broadcast handle (not the
  * filter itself) is what the plan serializes, so a multi-MB filter
  * still ships to executors once via torrent broadcast rather than
  * once per task closure. Null inputs yield null (standard
  * null-intolerant semantics); callers compose `isNotNull && probe`
  * for the never-match-null join contract. Measured vs the UDF form in
  * SCALE.md (round 12); parity + codegen gates in BloomJoinSpec.
  */
case class BloomProbe(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe expects a bigint or string input, got ${dt.simpleString}")
    }

  override def dataType: DataType = BooleanType

  @transient private lazy val filter: BloomFilter = bloom.value
  @transient private lazy val longKey: Boolean = child.dataType == LongType

  override protected def nullSafeEval(input: Any): Any =
    if (longKey) filter.mightContainLong(input.asInstanceOf[Long])
    else filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    // resolve the broadcast ONCE per operator instance (JVM-local block
    // fetch), not per row — the generated probe then calls straight
    // into the filter with the primitive value
    val bloomVar = ctx.addMutableState(bfClass, "bloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    if (child.dataType == LongType)
      defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainLong($c)")
    else
      defineCodeGen(ctx, ev, c => s"$bloomVar.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {

  /** Column form — the wrapper every consumer routes through. */
  def col(c: org.apache.spark.sql.Column,
      bloom: Broadcast[BloomFilter]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BloomProbe(org.apache.spark.sql.GraftSqlBridge.expression(c), bloom))
}
