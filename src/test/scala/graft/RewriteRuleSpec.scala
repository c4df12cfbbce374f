package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** The RewriteVectorDistance optimizer rule: HOF distance forms are
  * rewritten to the native codegen expressions with identical results.
  */
class RewriteRuleSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    GraftExtensions.register(spark)
    f
  }

  private def optimizedHas(df: DataFrame, needle: String): Boolean =
    df.queryExecution.optimizedPlan.toString.contains(needle)

  private lazy val emb = Tables.embeddings(spark, sf0001).limit(200)
    .select(col("vec_id"), col("embedding")).persist()

  private lazy val pairs = emb.as("a").crossJoin(emb.as("b"))
    .where(col("a.vec_id") < col("b.vec_id")).limit(500)

  test("HOF squared-L2 is rewritten to the native SquaredL2 expression") {
    withRule {
      val df = pairs.select(col("a.vec_id"), col("b.vec_id"),
        Vec.squaredL2Hof(col("a.embedding"), col("b.embedding")).as("d"))
      assert(optimizedHas(df, "squaredl2"),
        s"expected squaredl2 in:\n${df.queryExecution.optimizedPlan}")
      assert(!optimizedHas(df, "aggregate(zip_with"))
    }
  }

  test("HOF dot product is rewritten to the native DotProduct expression") {
    withRule {
      val df = pairs.select(
        Vec.dotHof(col("a.embedding"), col("b.embedding")).as("d"))
      assert(optimizedHas(df, "dotproduct"),
        s"expected dotproduct in:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("rewritten results are bitwise-equal to the native form") {
    withRule {
      val hof = pairs.select(col("a.vec_id").as("av"), col("b.vec_id").as("bv"),
        Vec.squaredL2Hof(col("a.embedding"), col("b.embedding")).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val native = pairs.select(col("a.vec_id").as("av"), col("b.vec_id").as("bv"),
        Vec.squaredL2(col("a.embedding"), col("b.embedding")).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(hof.nonEmpty && hof == native)
    }
  }

  test("SQL text using the HOF form is accelerated too") {
    withRule {
      emb.createOrReplaceTempView("emb_rr")
      val df = spark.sql(
        """SELECT vec_id, aggregate(
          |  zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),
          |           (x, y) -> (x - y) * (x - y)),
          |  0.0D, (acc, v) -> acc + v) AS d
          |FROM emb_rr""".stripMargin)
      assert(optimizedHas(df, "squaredl2"))
      assert(df.collect().forall(_.getDouble(1) == 0.0))
    }
  }

  test("non-matching shapes are left alone") {
    withRule {
      // (x - y) * (x + y) is NOT a distance kernel
      val df = pairs.select(
        aggregate(
          zip_with(Vec.asDouble(col("a.embedding")), Vec.asDouble(col("b.embedding")),
            (x, y) => (x - y) * (x + y)),
          lit(0.0), (acc, v) => acc + v).as("d"))
      assert(!optimizedHas(df, "squaredl2") && !optimizedHas(df, "dotproduct"))
      // integer zero / different fold also untouched
      val df2 = pairs.select(
        aggregate(
          zip_with(Vec.asDouble(col("a.embedding")), Vec.asDouble(col("b.embedding")),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v * 2).as("d"))
      assert(!optimizedHas(df2, "squaredl2"))
    }
  }
}
