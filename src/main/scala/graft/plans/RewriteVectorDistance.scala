package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{DotProduct, SquaredL2}

/** Optimizer rule: rewrites the portable higher-order-function forms of
  * squared-L2 distance and dot product into the native codegen
  * expressions, so a user (or the oracle-parity query catalog) writing
  *
  *   aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),
  *             (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)
  *
  * gets [[graft.functions.SquaredL2]]'s primitive-loop codegen (measured
  * 30× on a 4M-distance microbench, VecSpec) without changing their
  * query text. The rewrite is exact: both forms promote float elements
  * to double and fold left-to-right sequentially, bitwise-equal by
  * VecSpec's parity gate, and both yield NULL on null input, null
  * elements, or length mismatch.
  *
  * Matching is deliberately narrow — only the canonical kernel shapes
  * over `CAST(array<float> AS array<double>)` inputs with a `0.0D` zero
  * and an identity finish. Anything else (different accumulators,
  * integer arrays, extra terms) is left alone.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`
  * (new sessions) or `spark.experimental.extraOptimizations` (existing
  * sessions). Runs in the operator-optimization batch, i.e. after
  * analysis — lambda variables are resolved `NamedLambdaVariable`s
  * compared by exprId.
  */
object RewriteVectorDistance extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** CAST(x AS ARRAY<DOUBLE>) over an array<float> child. */
  private object DoubleCastOfFloatArray {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType.isInstanceOf[ArrayType] &&
          c.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
          isFloatArray(c.child) => Some(c.child)
      case _ => None
    }
  }

  private def sameVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedLambdaVariable => v match {
      case m: NamedLambdaVariable => n.exprId == m.exprId
      case _ => false
    }
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    // raw-bits check: -0.0D as the zero would surface for EMPTY arrays
    // (the fold returns the zero literal itself), where SquaredL2 yields
    // +0.0 — a bitwise deviation this project's parity standard forbids
    case Literal(d: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  /** merge = (acc, v) -> acc + v */
  private def isSumMerge(merge: Expression): Boolean = merge match {
    case LambdaFunction(add: Add, Seq(acc, v), _) =>
      sameVar(add.left, acc) && sameVar(add.right, v)
    case _ => false
  }

  /** finish = acc -> acc */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(acc), _) => sameVar(body, acc)
    case _ => false
  }

  /** The element kernel decides which native expression applies. */
  private def kernel(f: Expression): Option[(Expression, Expression) => Expression] =
    f match {
      case LambdaFunction(m: Multiply, Seq(x, y), _) => m.left match {
        case s1: Subtract => m.right match {
          // (x - y) * (x - y) → squared L2
          case s2: Subtract
              if sameVar(s1.left, x) && sameVar(s1.right, y) &&
                sameVar(s2.left, x) && sameVar(s2.right, y) =>
            Some(SquaredL2(_, _))
          case _ => None
        }
        // x * y → dot product
        case l if sameVar(l, x) && sameVar(m.right, y) => Some(DotProduct(_, _))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case aa @ ArrayAggregate(
          zip: ZipWith, zero, merge: LambdaFunction, finish: LambdaFunction)
          if isZeroDouble(zero) && isSumMerge(merge) && isIdentityFinish(finish) =>
        val rewritten = for {
          a <- DoubleCastOfFloatArray.unapply(zip.left)
          b <- DoubleCastOfFloatArray.unapply(zip.right)
          mk <- kernel(zip.function)
        } yield mk(a, b)
        rewritten.getOrElse(aa)
    }
}
