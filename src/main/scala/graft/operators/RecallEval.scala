package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Recall/QPS evaluation harness — the reference's vendored Faiss bench
  * protocol (`/root/reference/bench/faiss_bench_official/bench_all_ivf.py:
  * 283-363`): for each n_probe, run the full query batch, and report
  * recall@rank = fraction of queries whose TRUE nearest neighbor
  * (ground-truth rank 1) appears in the top-rank results, plus ms/query.
  *
  * Ground truth is the engine's own exact path (probe-all batch search),
  * so the evaluation is self-contained — the same shape as the bench's
  * IndexFlatL2 ground truth.
  */
object RecallEval {

  final case class Setting(nProbe: Int, recalls: Map[Int, Double],
      msPerQuery: Double, nQueries: Int)

  /** Held-out query set: database vectors with deterministic per-id
    * uniform jitter. Database vectors used verbatim as queries make the
    * sweep degenerate (a vector's nearest centroid always contains the
    * vector itself → recall 1.0 at n_probe=1); the reference's protocol
    * samples xq separately from xb for the same reason.
    */
  def perturbedQueries(vectors: Array[(Long, Array[Float])],
      scale: Float): Array[(Long, Array[Float])] =
    vectors.map { case (id, v) =>
      val rng = new java.util.Random(id * 2654435761L + 42L)
      (id, v.map(x => x + (rng.nextFloat() - 0.5f) * 2f * scale))
    }

  /** Run the sweep. Returns one Setting per n_probe. */
  def sweep(spark: SparkSession, index: Ivf.Index,
      queries: Array[(Long, Array[Float])], k: Int,
      nProbes: Seq[Int], ranks: Seq[Int],
      minDurationMs: Double = 0.0): Seq[Setting] = {
    // ground truth: exact top-1 per query via probe-all search
    val gt: Map[Long, Long] =
      Ivf.searchBatch(spark, index, queries, 1, index.config.maxNProbe)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

    nProbes.map { np =>
      // reference protocol: repeat the full batch until >= minDurationMs
      // elapsed, average ms/query over runs (bench_all_ivf.py eval_setting)
      var runs = 0
      var elapsedMs = 0.0
      var results: Array[org.apache.spark.sql.Row] = null
      while (runs == 0 || elapsedMs < minDurationMs) {
        val t0 = System.nanoTime()
        results = Ivf.searchBatch(spark, index, queries, k, np).collect()
        elapsedMs += (System.nanoTime() - t0) / 1e6
        runs += 1
      }
      // per query: ranked neighbor ids ascending
      val byQuery = results.groupBy(_.getLong(0)).map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2))
      }
      val recalls = ranks.map { rank =>
        val hit = queries.count { case (qid, _) =>
          byQuery.get(qid).exists(_.take(rank).contains(gt(qid)))
        }
        rank -> hit.toDouble / queries.length
      }.toMap
      Setting(np, recalls, elapsedMs / (runs.toLong * queries.length),
        queries.length)
    }
  }

  /** DataFrame form for the driver gate: deterministic columns only
    * (recalls, not timings).
    */
  def sweepDf(spark: SparkSession, index: Ivf.Index,
      queries: Array[(Long, Array[Float])], k: Int,
      nProbes: Seq[Int], ranks: Seq[Int]): DataFrame = {
    require(ranks.toSet.subsetOf(Set(1, 10, 100)),
      s"sweepDf reports recall_at_{1,10,100} columns only; got ranks=$ranks")
    import spark.implicits._
    val rows = sweep(spark, index, queries, k, nProbes, ranks).map { s =>
      (s.nProbe,
        math.rint(s.recalls.getOrElse(1, 0.0) * 10000) / 10000,
        math.rint(s.recalls.getOrElse(10, 0.0) * 10000) / 10000,
        math.rint(s.recalls.getOrElse(100, 0.0) * 10000) / 10000)
    }
    rows.toDF("n_probe", "recall_at_1", "recall_at_10", "recall_at_100")
      .orderBy("n_probe")
  }
}
