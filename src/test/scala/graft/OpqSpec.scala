package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Opq, Pq}

/** OPQ-lite gates: allocation balance (incl. the sub-unit-eigenvalue
  * degeneracy), exact distance preservation under the rotation, and the
  * reconstruction-error wins — modest on the near-isotropic corpus,
  * decisive on constructed anisotropic data (the case OPQ exists for).
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private def pqErr(df: org.apache.spark.sql.DataFrame, c: String,
      model: Pq.Model): Double = {
    val rows = Pq.encode(df, c, model).select(col(c), col("pq_code")).collect()
    rows.map { r =>
      KMeans.sqDist(r.getSeq[Float](0).toArray,
        Pq.decode(r.getSeq[Byte](1).toArray, model))
    }.sum / rows.length
  }

  test("allocation balances log-products, also for sub-unit eigenvalues") {
    // every bucket gets exactly dsub axes, all axes used exactly once
    val eigs = Array(64.0, 16.0, 4.0, 1.0)
    val perm = Opq.allocate(eigs, 2)
    assert(perm.sorted.toSeq == Seq(0, 1, 2, 3))
    val products = perm.grouped(2).map(_.map(eigs).product).toSeq
    assert(products == Seq(64.0, 64.0), s"unbalanced: $products")
    // the λ < 1 case: raw-log greedy degenerates to the identity
    // permutation (all logs negative); the shifted weights must not
    val small = Array.tabulate(8)(i => math.pow(2.0, -i / 2.0)) // all <= 1
    val p2 = Opq.allocate(small, 4)
    assert(p2.toSeq != small.indices.toSeq, "allocation degenerated to identity")
    val prods = p2.grouped(2).map(_.map(small).product).toSeq
    assert(prods.max / prods.min < 3.0,
      s"log-products badly unbalanced: $prods")
  }

  test("fit survives a null/ragged first row (dimension from the column)") {
    // head()-derived d would NPE on the null first row; fit must take d
    // from the non-null rows and exclude degraded (null / ragged-short)
    // rows from the statistics instead of corrupting the gram
    val rows: Seq[(Long, Seq[Float])] = Seq(
      (0L, null), (1L, Seq(1f, 2f)),
      (2L, Seq(3f, 1f, 0f, 2f)), (3L, Seq(0f, 5f, 1f, 1f)),
      (4L, Seq(2f, 2f, 9f, 9f)))
    val df = rows.toDF("vec_id", "emb").coalesce(1)
    val rot = Opq.fit(df, "emb", 2)
    assert(rot.d == 4)
    // all-null column is a clean error, not an NPE
    intercept[IllegalArgumentException](
      Opq.fit(Seq((0L, null: Seq[Float])).toDF("vec_id", "emb"), "emb", 2))
  }

  test("rotation preserves pairwise squared-L2 distances") {
    val emb = Tables.embeddings(spark, sf0001)
    val rot = Opq.fit(emb, "embedding", m = 8)
    val pairs = Opq.rotate(emb, "embedding", rot)
      .select(col("embedding"), col("opq_emb")).limit(100).collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
    pairs.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      val dx = KMeans.sqDist(x1, x2)
      val dy = KMeans.sqDist(y1, y2)
      assert(math.abs(dx - dy) < 1e-3 * (1.0 + dx),
        s"distance not preserved: $dx vs $dy")
    case _ => ()
    }
  }

  test("OPQ reconstruction beats raw PQ decisively on anisotropic data") {
    // z_i ~ N(0, 2^(-i/2)) mixed by a fixed orthonormal rotation —
    // correlated input with a steep spectrum (deterministic seeds)
    val d = 32
    val rnd = new scala.util.Random(7L)
    val g = Array.fill(d, d)(rnd.nextGaussian())
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        val dot = (0 until d).map(k => g(i)(k) * g(j)(k)).sum
        for (k <- 0 until d) g(i)(k) -= dot * g(j)(k)
      }
      val n = math.sqrt((0 until d).map(k => g(i)(k) * g(i)(k)).sum)
      for (k <- 0 until d) g(i)(k) /= n
    }
    val rows = (0 until 2000).map { r =>
      val rr = new scala.util.Random(1000L + r)
      val z = Array.tabulate(d)(i => rr.nextGaussian() * math.pow(2.0, -i / 4.0))
      (r.toLong, Array.tabulate(d)(i =>
        (0 until d).map(k => g(k)(i) * z(k)).sum.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val raw = Pq.train(df, "embedding", d, m = 8, ksub = 16,
      orderCol = Some("vec_id"))
    val rot = Opq.fit(df, "embedding", m = 8)
    val rotated = Opq.rotate(df, "embedding", rot)
    val opq = Pq.train(rotated, "opq_emb", d, m = 8, ksub = 16,
      orderCol = Some("vec_id"))
    val rawErr = pqErr(df, "embedding", raw)
    val opqErr = pqErr(rotated, "opq_emb", opq)
    // measured ~0.77 vs ~0.14: require at least a 2x win
    assert(opqErr < rawErr * 0.5,
      s"OPQ $opqErr not decisively below raw $rawErr")
  }

  test("OPQ reconstruction is not worse than raw PQ on the corpus") {
    val emb = Tables.embeddings(spark, sf001)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val raw = Pq.train(emb, "embedding", dim, m = 8, ksub = 16,
      orderCol = Some("vec_id"))
    val (rotFull, _) = queries.VectorQueries.opqModel(spark, sf001)
    val rotated = Opq.rotate(emb, "embedding", rotFull)
    val opq = Pq.train(rotated, "opq_emb", dim, m = 8, ksub = 16,
      orderCol = Some("vec_id"))
    val rawErr = pqErr(emb, "embedding", raw)
    val opqErr = pqErr(rotated, "opq_emb", opq)
    // measured ratio 0.93-0.96 on this corpus; guard against regressions
    assert(opqErr <= rawErr * 1.01,
      s"OPQ $opqErr worse than raw $rawErr at equal code budget")
  }

  test("OPQ search: self-retrieval and recall floor") {
    val out = queries.VectorQueries.opqTopK(spark, sf0001).collect()
    assert(out.head.getLong(0) == 0L, "self-retrieval failed")
    val exact = queries.VectorQueries.knnExact(spark, sf0001, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val got = out.map(_.getLong(0)).toSet
    assert((got & exact).size >= 5, s"OPQ recall too low: ${(got & exact).size}")
  }
}
