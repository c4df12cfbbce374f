package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature logistic regression — the GPT-3/PaLM-style quality
  * classifier: train a linear model to distinguish a high-quality
  * target distribution from the raw corpus, then score (and filter)
  * every document with it. The model is the standard fasttext-filter
  * stand-in re-expressed for Spark: feature hashing (no vocabulary to
  * build or ship), full-batch gradient descent where each iteration is
  * ONE `treeAggregate` pass, and map-side scoring with the broadcast
  * weight vector.
  *
  * Scale shape: the model is `dim` doubles (8 KB at dim=1024) — always
  * broadcastable. Training cost is iters × one-pass-over-the-sample;
  * at 100 TB you train on a deterministic [[Sampling.hashSample]] (a
  * quality classifier needs ~10^5-10^6 rows, not the corpus) and score
  * corpus-wide, which is a pure map-side pass inside one stage.
  * Gradient accumulation uses treeAggregate so the driver merges
  * O(log P) partial vectors, not P.
  */
object LinearClassifier {

  final case class Model(weights: Array[Double], bias: Double) {
    def dim: Int = weights.length
  }

  /** Feature index of a token: the engine's md5-derived 60-bit hash
    * ([[graft.functions.Md5Long60]]) mod dim — stable across JVMs and
    * runs, non-negative, and expressible in the DuckDB oracle as
    * `CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % dim`, which
    * is what lets the trained model's corpus-wide scores be
    * hash-compared end-to-end (the same recipe the MinHash family
    * uses). md5 costs a few× MurmurHash3 per token, but scoring stays a
    * map-side pass and feature extraction is not the bottleneck (the
    * GD passes over the cached sparse features are).
    */
  private def bucket(token: String, dim: Int): Int =
    (graft.functions.Md5Long60.compute(
      token.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % dim).toInt

  /** Sparse L1-normalized hashed term frequencies: (indices, values).
    * Normalizing by token count keeps long documents from dominating
    * the gradient; collisions just add (standard feature hashing).
    */
  private def features(toks: Seq[String], dim: Int): (Array[Int], Array[Double]) = {
    val counts = scala.collection.mutable.HashMap.empty[Int, Double]
    // a null ELEMENT inside the array (the row-level guards only see
    // the array itself) would NPE in bucket(); skip it like the L1
    // normalizer below skips nothing — degraded tokens carry no feature
    toks.foreach { t =>
      if (t != null) { val b = bucket(t, dim)
      counts(b) = counts.getOrElse(b, 0.0) + 1.0 }
    }
    val n = toks.length.toDouble
    val idx = counts.keys.toArray.sorted
    (idx, idx.map(counts(_) / n))
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Numerically-stable softplus: log(1 + e^x) without overflow. */
  private def softplus(x: Double): Double =
    math.max(x, 0.0) + math.log1p(math.exp(-math.abs(x)))

  /** Train on a DataFrame with an array<string> token column and a
    * boolean/int label column (1 = target distribution). Deterministic
    * up to float summation order (init 0, fixed schedule, no sampling);
    * exact partitioning-independence is NOT guaranteed — gradients are
    * float sums — but the decision boundary is stable (gated in
    * ClassifierSpec).
    *
    * `iters` is a CEILING: each gradient pass also accumulates the
    * mean log-loss (free — same treeAggregate), and training stops
    * once the per-pass improvement drops below `tol`. A converged
    * model does not pay for the remaining scheduled passes — at scale
    * each pass is a full cluster job, so the early stop bounds the
    * sequential-job count by convergence, not by the worst case.
    *
    * @param l2  ridge term — keeps collided/rare buckets from blowing up
    * @param tol mean-log-loss delta below which training stops early
    */
  def train(df: DataFrame, tokensCol: String, labelCol: String,
      dim: Int = 1024, iters: Int = 50, lr: Double = 4.0,
      l2: Double = 1e-6, tol: Double = 1e-4): Model = {
    require(dim > 0 && iters > 0, s"dim=$dim iters=$iters must be > 0")
    val spark = df.sparkSession
    // one extraction pass, persisted: every GD iteration re-reads the
    // sparse features, not the text
    val raw = df
      .select(col(tokensCol), col(labelCol).cast("int"))
      // null labels (e.g. a NULL lang column) are excluded like null
      // token arrays — a clean degraded-row contract, not an executor
      // NPE at getInt
      .where(col(tokensCol).isNotNull && size(col(tokensCol)) > 0 &&
        col(labelCol).isNotNull)
      .rdd
      .map { r =>
        val (idx, v) = features(r.getSeq[String](0), dim)
        (idx, v, r.getInt(1).toDouble)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = raw.count()
    require(n > 0, "LinearClassifier.train: no usable rows")
    // each GD pass is one sequential job over this RDD; near-empty
    // tasks make SCHEDULING the training cost (iters × parts task
    // launches), so pack ≥ ~500 rows per task — still every-core
    // distributed when n is large, a handful of tasks when it is not
    val parts = math.max(1L, math.min(raw.getNumPartitions.toLong,
      math.ceil(n / 500.0).toLong)).toInt
    val data =
      if (parts < raw.getNumPartitions) {
        val d = raw.coalesce(parts)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // materialize the coalesced cache, then drop the source cache —
        // holding both doubles memory for the whole training loop
        d.count()
        raw.unpersist()
        d
      } else raw

    var w = new Array[Double](dim)
    var b = 0.0
    var prevLoss = Double.MaxValue
    // best weights by MEASURED loss: the loss computed in a pass belongs
    // to the weights BEFORE that pass's update, so the final update of
    // the last pass is never evaluated — return the best measured state,
    // not the last (possibly overshooting) unevaluated one
    var bestLoss = Double.MaxValue
    var bestW = w
    var bestB = b
    var it = 0
    var stop = false
    while (it < iters && !stop) {
      val wB = spark.sparkContext.broadcast((w, b))
      val zero = (new Array[Double](dim), 0.0, 0.0)
      val (gw, gb, lossSum) = data.treeAggregate(zero)(
        seqOp = { case ((gradW, gradB, loss), (idx, v, y)) =>
          val (wv, bv) = wB.value
          var z = bv
          var i = 0
          while (i < idx.length) { z += wv(idx(i)) * v(i); i += 1 }
          val err = sigmoid(z) - y
          i = 0
          while (i < idx.length) { gradW(idx(i)) += err * v(i); i += 1 }
          // log-loss of the CURRENT weights, accumulated in the same
          // pass: y·softplus(−z) + (1−y)·softplus(z), stable at |z|≫0
          (gradW, gradB + err, loss + y * softplus(-z) + (1.0 - y) * softplus(z))
        },
        combOp = { case ((g1, b1, l1), (g2, b2, l2s)) =>
          var i = 0
          while (i < dim) { g1(i) += g2(i); i += 1 }
          (g1, b1 + b2, l1 + l2s)
        })
      wB.destroy()
      val meanLoss = lossSum / n
      if (meanLoss < bestLoss) { bestLoss = meanLoss; bestW = w; bestB = b }
      val next = new Array[Double](dim)
      var i = 0
      while (i < dim) { next(i) = w(i) - lr * (gw(i) / n + l2 * w(i)); i += 1 }
      w = next
      b = b - lr * (gb / n)
      // converged = a small NON-NEGATIVE improvement. A worsening pass
      // (overshoot at high lr) must keep training — gradient descent
      // routinely recovers, and stopping there both halts early AND
      // would return weights one unevaluated step PAST the overshoot.
      stop = meanLoss <= prevLoss && prevLoss - meanLoss < tol
      prevLoss = meanLoss
      it += 1
    }
    // the loop measures each state one pass late, so the final update
    // is never evaluated inside it — score it once (loss only) so short
    // runs (small iters) don't fall back to an earlier state by default
    locally {
      val wB = spark.sparkContext.broadcast((w, b))
      val finalLoss = data.treeAggregate(0.0)(
        seqOp = { case (loss, (idx, v, y)) =>
          val (wv, bv) = wB.value
          var z = bv
          var i = 0
          while (i < idx.length) { z += wv(idx(i)) * v(i); i += 1 }
          loss + y * softplus(-z) + (1.0 - y) * softplus(z)
        },
        combOp = _ + _) / n
      wB.destroy()
      if (finalLoss < bestLoss) { bestW = w; bestB = b }
    }
    data.unpersist()
    Model(bestW, bestB)
  }

  /** p(target | doc) as a column — map-side scoring with the broadcast
    * model. Null/empty token arrays score sigmoid(bias) (the prior),
    * never a task failure.
    */
  def scoreCol(df: DataFrame, tokensCol: Column, model: Model): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val f = udf { (toks: Seq[String]) =>
      val m = bc.value
      if (toks == null || toks.isEmpty) sigmoid(m.bias)
      else {
        val (idx, v) = features(toks, m.dim)
        var z = m.bias
        var i = 0
        while (i < idx.length) { z += m.weights(idx(i)) * v(i); i += 1 }
        sigmoid(z)
      }
    }
    f(tokensCol)
  }
}
