package graft

import org.apache.spark.sql.functions._
import graft.operators.{Opq, Pca, Pq, KMeans}

/** Measure raw-PQ vs OPQ-rotated-PQ reconstruction error + recall. */
object DebugOpq {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    for (m <- Seq(8, 16); ksub <- Seq(16, 256)) {
      val raw = Pq.train(emb, "embedding", dim, m = m, ksub = ksub,
        orderCol = Some("vec_id"))
      val rot = Opq.fit(emb, "embedding", m)
      val rotated = Opq.rotate(emb, "embedding", rot)
      val opq = Pq.train(rotated, "opq_emb", dim, m = m, ksub = ksub,
        orderCol = Some("vec_id"))
      def err(df: org.apache.spark.sql.DataFrame, c: String, model: Pq.Model): Double = {
        val rows = Pq.encode(df, c, model)
          .select(col(c), col("pq_code")).collect()
        rows.map { r =>
          val x = r.getSeq[Float](0).toArray
          val dec = Pq.decode(r.getSeq[Byte](1).toArray, model)
          KMeans.sqDist(x, dec)
        }.sum / rows.length
      }
      val rawErr = err(emb, "embedding", raw)
      val opqErr = err(rotated, "opq_emb", opq)
      println(f"RESULT m=$m ksub=$ksub rawErr=$rawErr%.4f opqErr=$opqErr%.4f ratio=${opqErr / rawErr}%.3f")
    }
    // correlated anisotropic data: z_i ~ N(0, 2^(-i/4)) mixed by a fixed
    // rotation — the case OPQ exists for
    {
      import spark.implicits._
      val d = 32
      val rnd = new scala.util.Random(7L)
      // deterministic orthonormal mix via Gram-Schmidt on gaussians
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
        val x = Array.tabulate(d)(i =>
          (0 until d).map(k => g(k)(i) * z(k)).sum.toFloat)
        (r.toLong, x.toSeq)
      }
      val df = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      for (m <- Seq(8); ksub <- Seq(16)) {
        val raw = Pq.train(df, "embedding", d, m = m, ksub = ksub,
          orderCol = Some("vec_id"))
        val rot = Opq.fit(df, "embedding", m)
        val rotated = Opq.rotate(df, "embedding", rot)
        val opq = Pq.train(rotated, "opq_emb", d, m = m, ksub = ksub,
          orderCol = Some("vec_id"))
        def err(dfx: org.apache.spark.sql.DataFrame, c: String, model: Pq.Model): Double = {
          val rs = Pq.encode(dfx, c, model).select(col(c), col("pq_code")).collect()
          rs.map { r =>
            KMeans.sqDist(r.getSeq[Float](0).toArray,
              Pq.decode(r.getSeq[Byte](1).toArray, model))
          }.sum / rs.length
        }
        println(f"ANISO m=$m ksub=$ksub rawErr=${err(df, "embedding", raw)}%.5f opqErr=${err(rotated, "opq_emb", opq)}%.5f")
        // diagnostics: distance preservation + per-subspace variance
        val pairs = rotated.select(col("embedding"), col("opq_emb")).limit(200).collect()
          .map(r => (r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
        val maxDistErr = pairs.sliding(2).collect { case Array((x1, y1), (x2, y2)) =>
          math.abs(KMeans.sqDist(x1, x2) - KMeans.sqDist(y1, y2))
        }.max
        println(f"ANISO distance preservation max err = $maxDistErr%.6f")
        val dsub = d / m
        def subVars(c: String, dfx: org.apache.spark.sql.DataFrame): Seq[Double] = {
          val vs = dfx.select(col(c)).collect().map(_.getSeq[Float](0).toArray)
          (0 until m).map { j =>
            (j * dsub until (j + 1) * dsub).map { i =>
              val mean = vs.map(_(i).toDouble).sum / vs.length
              vs.map(v => (v(i) - mean) * (v(i) - mean)).sum / vs.length
            }.sum
          }
        }
        println("ANISO raw subspace vars: " + subVars("embedding", df).map(v => f"$v%.3f").mkString(" "))
        println("ANISO opq subspace vars: " + subVars("opq_emb", rotated).map(v => f"$v%.3f").mkString(" "))
        val rot2 = Opq.fit(df, "embedding", m)
        println("ANISO eigs: " + Pca.fit(df, "embedding", d).eigenvalues.take(12).map(v => f"$v%.3f").mkString(" "))
        println("ANISO perm: " + rot2.perm.mkString(" "))
      }
    }
    spark.stop()
  }
}
