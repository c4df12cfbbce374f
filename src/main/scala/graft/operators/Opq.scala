package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-lite: PCA rotation + eigenvalue allocation before product
  * quantization (the non-parametric initialization of Ge et al.,
  * "Optimized Product Quantization", CVPR 2013 — the same construction
  * faiss ships as `OPQMatrix`'s PCA-based starting point).
  *
  * PQ quantizes each of m subspaces independently, so its error is
  * minimized when (a) dimensions are decorrelated and (b) variance is
  * spread evenly across subspaces. A plain PCA rotation achieves (a)
  * but concentrates variance in the first subspace; eigenvalue
  * allocation fixes (b) by greedily dealing principal dimensions to
  * subspaces so the per-subspace variance products balance (minimizing
  * the product is the right objective because a subspace's quantizer
  * error scales with the geometric mean of its eigenvalues).
  *
  * The rotation y = P·V·(x − μ) is orthonormal, so all pairwise
  * squared-L2 distances are preserved exactly (up to float rounding):
  * ADC distances over rotated codes estimate TRUE distances, and
  * search-side code (LUTs, folds, top-k) is the plain [[Pq]] machinery
  * on the rotated column.
  */
object Opq {

  /** Rotation model: PCA basis + subspace permutation. */
  final case class Rotation(mean: Array[Double],
      basis: Array[Array[Double]], // d rows (principal axes, orthonormal)
      perm: Array[Int]) {          // output row r takes principal axis perm(r)
    def d: Int = mean.length
  }

  /** Greedy eigenvalue allocation: deal axes (sorted by eigenvalue,
    * largest first) to the m subspaces, always to the subspace with the
    * smallest current log-eigenvalue product among those not yet full.
    * Returns the output-order permutation: subspace j owns output rows
    * [j·dsub, (j+1)·dsub).
    */
  def allocate(eigs: Array[Double], m: Int): Array[Int] = {
    val d = eigs.length
    require(d % m == 0, s"d=$d not divisible by m=$m")
    val dsub = d / m
    val order = eigs.indices.sortBy(i => (-eigs(i), i))
    // Work with non-negative weights w = log(λ/λmin): balancing products
    // is invariant to scaling every λ (each bucket ends with exactly dsub
    // items, so a constant shift cancels in the FINAL sums), but the
    // greedy's PARTIAL sums are not — with raw logs of sub-unit
    // eigenvalues every weight is negative, "smallest sum so far" keeps
    // pointing at the bucket that just received the largest axis, and
    // the allocation degenerates to the identity (no balancing at all).
    // +1e-12 guards log(0) for degenerate zero-variance axes; clamping
    // at 0 first guards Jacobi round-off returning a zero eigenvalue as
    // a tiny NEGATIVE — a negative minEig flips every ratio's sign and
    // log(negative) = NaN would silently degenerate the allocation to
    // the identity (covariance eigenvalues are >= 0 mathematically, so
    // the clamp only ever removes numerical noise).
    val minEig = math.max(eigs.min, 0.0) + 1e-12
    val w = eigs.map(e => math.log((math.max(e, 0.0) + 1e-12) / minEig))
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(List.empty[Int])
    order.foreach { axis =>
      val j = (0 until m)
        .filter(buckets(_).length < dsub)
        .minBy(b => (logSum(b), b))
      logSum(j) += w(axis)
      buckets(j) = axis :: buckets(j)
    }
    buckets.flatMap(_.reverse)
  }

  /** Fit the rotation on a full-rank PCA of the embedding column.
    * The dimension is the MODAL array size over non-null rows
    * ([[Pca.inferDim]]) — max(size) would let a single too-long corrupt
    * row define d and exclude every normal row from the fit.
    */
  def fit(df: DataFrame, embCol: String, m: Int): Rotation = {
    // Pca.fit(df, embCol) infers the dimension itself — passing
    // inferDim's result as q would run the full-table size aggregation
    // twice per fit
    val pca = Pca.fit(df, embCol)
    Rotation(pca.mean, pca.components, allocate(pca.eigenvalues, m))
  }

  /** Apply y = P·V·(x − μ) as a one-time map-side pass (broadcast
    * rotation), same contract as [[Pca.transform]] / [[Pq.encode]]:
    * null/ragged in → null out.
    */
  def rotate(df: DataFrame, embCol: String, rot: Rotation,
      outCol: String = "opq_emb"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(rot)
    val f = udf { (emb: Seq[Float]) =>
      val r = bc.value
      if (emb == null || emb.length != r.d) null
      else {
        val x = emb.toArray
        Seq.tabulate(r.d) { row =>
          val comp = r.basis(r.perm(row))
          var acc = 0.0
          var i = 0
          while (i < r.d) { acc += comp(i) * (x(i) - r.mean(i)); i += 1 }
          acc.toFloat
        }
      }
    }
    df.withColumn(outCol, f(col(embCol)))
  }

  /** Rotate a single (query) vector driver-side — bitwise the same
    * arithmetic as the distributed path.
    */
  def rotateVec(x: Array[Float], rot: Rotation): Array[Float] = {
    // same contract as the distributed rotate(): a short vector would
    // AIOOBE mid-loop and a LONG one would silently truncate to d dims
    // and return confidently wrong neighbors downstream
    require(x.length == rot.d,
      s"rotateVec: vector dim ${x.length} != rotation dim ${rot.d}")
    Array.tabulate(rot.d) { row =>
      val comp = rot.basis(rot.perm(row))
      var acc = 0.0
      var i = 0
      while (i < rot.d) { acc += comp(i) * (x(i) - rot.mean(i)); i += 1 }
      acc.toFloat
    }
  }
}
