package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.functions.{DotProduct, SquaredL2}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL users:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT squared_l2(a.embedding, b.embedding) FROM ...
  *
  * Also injects [[graft.plans.RewriteVectorDistance]], the optimizer
  * rule that rewrites the portable HOF distance/dot forms to the native
  * codegen expressions (30×) without changing query text. Custom
  * strategies are NOT injected — every graft operator lowers to
  * built-in physical plans by design (SURVEY.md §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RewriteVectorDistance)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("squared_l2"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SquaredL2].getCanonicalName, "squared_l2"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(args.length == 2, "squared_l2 takes 2 arguments")
          SquaredL2(args(0), args(1))
        }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getCanonicalName, "dot_product"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          require(args.length == 2, "dot_product takes 2 arguments")
          DotProduct(args(0), args(1))
        }))
  }
}

object GraftExtensions {
  /** Register on an existing session (for sessions built without the
    * extensions conf — e.g. the driver-owned Verify/Bench sessions).
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteVectorDistance))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteVectorDistance
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "squared_l2", args => {
        require(args.length == 2, "squared_l2 takes 2 arguments")
        SquaredL2(args.head, args(1))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", args => {
        require(args.length == 2, "dot_product takes 2 arguments")
        DotProduct(args.head, args(1))
      }, "scala_udf")
  }
}
