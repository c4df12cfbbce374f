package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Pca}

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobi recovers a known 2x2 eigensystem exactly") {
    // [[2,1],[1,2]] → eigenvalues 3 (vec ∝ (1,1)) and 1 (vec ∝ (1,-1))
    val (eig, vecs) = Pca.jacobiEigSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = eig.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    val v3 = vecs(eig.indexOf(eig.max))
    assert(math.abs(math.abs(v3(0)) - math.abs(v3(1))) < 1e-12)
    assert(math.abs(v3(0) * v3(0) + v3(1) * v3(1) - 1.0) < 1e-12)
  }

  test("line-shaped data puts all variance on the first component") {
    val pts = (1 to 200).map(i => Seq(i.toFloat, (2 * i).toFloat))
    val df = pts.toDF("embedding")
    val m = Pca.fit(df, "embedding", 2)
    // direction ∝ (1, 2)/√5
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(1) / c0(0)) - 2.0) < 1e-9)
    assert(m.eigenvalues(1) / m.eigenvalues(0) < 1e-12)
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-6 * m.totalVariance)
  }

  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val model = Pca.fit(emb, "embedding", 16)

  test("components are orthonormal, eigenvalues descending") {
    for (r <- model.components.indices; s <- r until model.q) {
      val dot = model.components(r).zip(model.components(s))
        .map { case (a, b) => a * b }.sum
      val want = if (r == s) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$r, v$s> = $dot")
    }
    model.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12)
    }
  }

  test("fit is independent of partitioning (tree-aggregated stats)") {
    val m2 = Pca.fit(emb.repartition(17), "embedding", 16)
    model.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(a)))
    }
  }

  test("reconstruction error shrinks as q grows, q=d is exact") {
    val rows = emb.select(col("embedding")).limit(100)
      .collect().map(_.getSeq[Float](0).toArray)
    val d = rows.head.length
    def mse(q: Int): Double = {
      val m = Pca.fit(emb, "embedding", q)
      val projDf = Pca.transform(emb.limit(100), "embedding", m)
        .select(col("embedding"), col("pca_emb")).collect()
      projDf.map { r =>
        val x = r.getSeq[Float](0).toArray.map(_.toDouble)
        val rec = Pca.reconstruct(r.getSeq[Float](1).toArray, m)
        x.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / projDf.length
    }
    val e8 = mse(8); val e32 = mse(32); val eD = mse(d)
    assert(e32 < e8, s"mse q=32 ($e32) !< q=8 ($e8)")
    assert(eD < 1e-6, s"full-rank reconstruction not exact: $eD")
  }

  test("a too-long corrupt row cannot hijack the fit dimension") {
    // dim = MODAL size, not max: one corrupt 5-wide row among 200
    // 2-wide rows must leave d=2 (max-size would fit on the corrupt
    // row ALONE — every normal row excluded by the size filter)
    val pts = (1 to 200).map(i => Seq(i.toFloat, (2 * i).toFloat)) :+
      Seq(1f, 2f, 3f, 4f, 5f)
    val df = pts.toDF("embedding")
    assert(Pca.inferDim(df, "embedding") == 2)
    val m = Pca.fit(df, "embedding", 2)
    assert(m.mean.length == 2)
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(1) / c0(0)) - 2.0) < 1e-9)
    // Opq inherits the same derivation
    val rot = graft.operators.Opq.fit(df, "embedding", m = 2)
    assert(rot.mean.length == 2)
  }

  test("transform degrades null/ragged embeddings to null, not a crash") {
    val bad = Seq(
      (-1L, Seq(1f, 2f)),              // wrong dimension
      (-2L, null.asInstanceOf[Seq[Float]]),
    ).toDF("vec_id", "embedding")
    val mixed = emb.select(col("vec_id"), col("embedding")).limit(3)
      .unionByName(bad)
    val out = Pca.transform(mixed, "embedding", model)
      .select("vec_id", "pca_emb").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(-1L) && out(-2L), "degraded rows must project to null")
    assert(out.count(!_._2) == 3, "good rows must still project")
  }

  test("PCA(16) candidate generation + exact re-rank recovers exact top-10") {
    // the classic two-stage ANN: top-50 in the 16-dim space, re-ranked
    // exactly in the original space
    val reduced = Pca.transform(emb, "embedding", model)
    val q = reduced.where(col("vec_id") === 0L)
      .select(col("pca_emb"), col("embedding")).head()
    val qRed = lit(q.getSeq[Float](0).toArray)
    val cands = reduced
      .withColumn("rd", graft.functions.Vec.squaredL2(col("pca_emb"), qRed))
      .orderBy(col("rd"), col("vec_id")).limit(50)
    val qFull = lit(q.getSeq[Float](1).toArray)
    val got = cands
      .withColumn("distance", graft.functions.Vec.squaredL2(col("embedding"), qFull))
      .orderBy(col("distance"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val exact = graft.queries.VectorQueries.knnExact(spark, sf0001, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (got & exact).size / 10.0
    assert(recall >= 0.6, s"PCA two-stage recall@10 = $recall")
  }
}
