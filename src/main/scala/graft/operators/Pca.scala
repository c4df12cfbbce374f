package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the dimensionality-reduction step a
  * pipeline runs before indexing/clustering when d is large.
  *
  * Distributed shape: one pass over the table accumulating the
  * per-partition sufficient statistics (n, Σx, ΣxxT) via
  * `treeAggregate` — d + d² doubles per partition, merged in a tree so
  * the driver never sees more than a handful of d×d blocks at once
  * (d=64 → 33 KB per partial; fine up to d of a few thousand). The
  * eigendecomposition of the d×d covariance runs on the driver (cyclic
  * Jacobi — symmetric, guaranteed convergence); projection back over
  * the table is a one-pass map-side transform, same cost shape as
  * Pq.encode. Nothing in the pipeline shuffles row data.
  */
object Pca {

  /** mean (d), components (q rows of d — orthonormal eigenvectors,
    * eigenvalue-descending), eigenvalues (q), total variance (trace).
    */
  final case class Model(mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def d: Int = mean.length
    def q: Int = components.length
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as rows), unsorted.
    */
  def jacobiEigSym(a0: Array[Array[Double]], maxSweeps: Int = 64,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    // v starts as identity; columns accumulate the rotations
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    // the convergence cut is RELATIVE to the matrix scale: an absolute
    // tolerance is unreachable for covariances with non-tiny entries
    // (the off-norm floors at machine noise ~eps·‖A‖, e.g. ~2e-12 for
    // entries ~1e4), so the loop burned all maxSweeps rotating on
    // rounding noise — minutes of driver CPU at d≈1024 for a result
    // the first ~10 sweeps already had (r15 review)
    val fro = math.sqrt(a.iterator.map(r => r.iterator.map(x => x * x).sum).sum)
    val cut = tol * math.max(fro, java.lang.Double.MIN_NORMAL)
    var sweep = 0
    var off = offNorm(a)
    while (sweep < maxSweeps && off > cut) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > cut / (n * n)) {
            // rotation angle zeroing a(p)(q); theta == 0 → 45° rotation
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    val eig = Array.tabulate(n)(i => a(i)(i))
    val vecRows = Array.tabulate(n)(j => Array.tabulate(n)(i => v(i)(j)))
    (eig, vecRows)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** The column's dimension, taken as the MODAL (most frequent) array
    * size over non-null rows — not max(size), where a single corrupt
    * row LONGER than the true dimension would silently set d to the
    * corrupt length and the `size === d` fit filter would then exclude
    * every normal row, fitting the model on the corrupt rows alone.
    * With the mode, corrupt rows (long or short) are the ones excluded.
    * Ties break toward the smaller size for determinism. One bounded
    * groupBy (a column has few distinct sizes), shared with Opq.fit.
    */
  def inferDim(df: DataFrame, embCol: String): Int = {
    val sizes = df.where(col(embCol).isNotNull)
      .groupBy(size(col(embCol)).as("__pca_d")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    require(sizes.nonEmpty, s"PCA: no non-null rows in '$embCol'")
    sizes.maxBy { case (d, cnt) => (cnt, -d) }._1
  }

  /** Fit top-q components over an ArrayType(FloatType) column. */
  /** Full-rank fit (q = inferred dimension) — one size aggregation, not
    * the two a caller-side `fit(df, c, inferDim(df, c))` would cost.
    */
  def fit(df: DataFrame, embCol: String): Model = {
    val d = inferDim(df, embCol)
    fitAt(df, embCol, d, d)
  }

  def fit(df: DataFrame, embCol: String, q: Int): Model =
    fitAt(df, embCol, inferDim(df, embCol), q)

  private def fitAt(df: DataFrame, embCol: String, d: Int, q: Int): Model = {
    // dimension from the modal size ([[inferDim]]); null/ragged rows are
    // then EXCLUDED from the statistics — the fit-side analog of
    // transform's null-projection contract (they'd NPE / corrupt the
    // gram accumulator otherwise).
    require(q >= 1 && q <= d, s"q=$q out of [1, $d]")
    val rdd = df.select(col(embCol))
      .where(col(embCol).isNotNull && size(col(embCol)) === d)
      .rdd
      .map(_.getSeq[Float](0).toArray)
    // sufficient statistics: (count, sum[d], gram[d*d] row-major)
    val zero = (0L, new Array[Double](d), new Array[Double](d * d))
    val (n, s, g) = rdd.treeAggregate(zero)(
      seqOp = { case ((cnt, sum, gram), x) =>
        var i = 0
        while (i < d) {
          val xi = x(i).toDouble
          sum(i) += xi
          var j = 0
          val base = i * d
          while (j < d) { gram(base + j) += xi * x(j); j += 1 }
          i += 1
        }
        (cnt + 1, sum, gram)
      },
      combOp = { case ((c1, s1, g1), (c2, s2, g2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { g1(i) += g2(i); i += 1 }
        (c1 + c2, s1, g1)
      })
    require(n > 1, "PCA: need at least 2 rows")
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      g(i * d + j) / n - mean(i) * mean(j))
    val (eig, vecs) = jacobiEigSym(cov)
    val order = eig.indices.sortBy(i => (-eig(i), i))
    val top = order.take(q)
    Model(mean,
      top.map(vecs(_)).toArray,
      top.map(eig(_)).toArray,
      eig.sum)
  }

  /** Project to the q-dim component space: out = V·(x − μ). One-time
    * map-side pass (broadcast model), like Pq.encode.
    */
  def transform(df: DataFrame, embCol: String, model: Model,
      outCol: String = "pca_emb"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val proj = udf { (emb: Seq[Float]) =>
      val m = bc.value
      // Degraded-row contract (same as Pq.encode / Ivf.search): null or
      // wrong-dimension embedding → null projection, never a task failure.
      // Downstream top-k orders with asc_nulls_last so such rows lose.
      if (emb == null || emb.length != m.d) null
      else {
        val x = emb.toArray
        Seq.tabulate(m.q) { r =>
          val comp = m.components(r)
          var acc = 0.0
          var i = 0
          while (i < m.d) { acc += comp(i) * (x(i) - m.mean(i)); i += 1 }
          acc.toFloat
        }
      }
    }
    df.withColumn(outCol, proj(col(embCol)))
  }

  /** Reconstruct from the component space (test/quality metric). */
  def reconstruct(y: Array[Float], model: Model): Array[Double] = {
    val out = model.mean.clone()
    var r = 0
    while (r < model.q) {
      val comp = model.components(r)
      var i = 0
      while (i < model.d) { out(i) += y(r) * comp(i); i += 1 }
      r += 1
    }
    out
  }
}
