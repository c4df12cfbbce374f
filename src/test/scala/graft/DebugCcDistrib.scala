package graft

import org.apache.spark.sql.functions._

/** Scale cell for the DISTRIBUTED connected-components branch behind
  * `dedup_clusters` (VERDICT r17 #6): every committed cell so far ran
  * the driver union-find because no real pair graph exceeded the 2²²
  * localEdgeCap — at 100 TB the dedup graph always does, so the star
  * branch needed a committed run on pipeline-shaped input, not just
  * the DebugCcScale chain/star unit shapes.
  *
  * Corpus: the documents table unioned with (N−1) key-shifted copies
  * (DebugScaleNx's near-dup construction, documents only — the other
  * tables don't feed this query). Each source doc's N suffix-perturbed
  * copies are mutual near-dups, so the verified pair graph carries
  * ~5000·C(N,2) clique edges; N=52 puts it past the 4.19M cap with
  * margin even after LSH bucket capping. This is the adversarial
  * mega-clique shape a near-dup corpus produces at scale (hot
  * min-label keys), exactly what the alternating-star algorithm's
  * partial-aggregatable groupBy-min exists for.
  *
  * The timed call is the CATALOG query (`DedupQueries.dedupClusters`),
  * not a direct run() invocation — the cell certifies the dispatch
  * itself. Reports rounds-to-convergence, per-round edge counts and
  * shuffle-write volume (stage completions bucketed into round windows
  * via ConnectedComponents.lastRunStats timestamps), and verifies the
  * labeling against the input pairs: every verified pair must land in
  * one cluster (the CC invariant), checked distributed, zero tolerance.
  *
  * Usage: Test/runMain graft.DebugCcDistrib [srcDir] [outDir] [N]
  */
object DebugCcDistrib {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_cc_corpus"
    val n = if (args.length > 2) args(2).toInt else 52
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = 100000000L
    val base = spark.read.parquet(s"$src/documents.parquet")
    val copies = (1 until n).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text",
          concat_ws(" ", col("text"), concat(lit("x"), col("doc_id"))))
    }
    copies.foldLeft(base)(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()

    // stage-level shuffle-write log: (completion nanoTime, bytes) —
    // bucketed into rounds below via lastRunStats round timestamps
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null)
            stageLog.add((System.nanoTime(),
              m.shuffleWriteMetrics.bytesWritten))
        }
      })

    val tp0 = System.nanoTime()
    val pairsPath = graft.queries.DedupQueries.verifiedPairsPath(spark, out)
    val pairs = spark.read.parquet(pairsPath)
    val nPairs = pairs.count()
    val pairsS = (System.nanoTime() - tp0) / 1e9

    stageLog.clear()
    val t0 = System.nanoTime()
    val clusters = graft.queries.DedupQueries.dedupClusters(spark, out)
      .persist()
    val nRows = clusters.count()
    val clusterS = (System.nanoTime() - t0) / 1e9

    val stats = graft.operators.ConnectedComponents.lastRunStats
    require(stats.nonEmpty,
      s"distributed branch NOT taken: $nPairs pairs <= 4.19M cap — " +
        "raise N")
    // per-round shuffle volume: stages completing in (t_{r-1}, t_r]
    val stages = {
      val a = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val it = stageLog.iterator()
      while (it.hasNext) a += it.next()
      a.toSeq
    }
    val roundsJs = stats.sliding(2).collect {
      case Seq(prev, curRound) =>
        val mb = stages
          .filter(s => s._1 > prev.atNanos && s._1 <= curRound.atNanos)
          .map(_._2).sum / 1e6
        f"""{"round":${curRound.round},"edges":${curRound.edges},"shuffle_write_mb":$mb%.1f}"""
    }.mkString("[", ",", "]")

    // CC invariant against the real input: both endpoints of every
    // verified pair share a cluster label — distributed anti-check,
    // zero rows tolerated
    val lab = clusters.select(col("doc_id").as("id"),
      col("cluster_id"))
    val broken = pairs
      .join(lab.withColumnRenamed("id", "a_id")
        .withColumnRenamed("cluster_id", "ca"), "a_id")
      .join(lab.withColumnRenamed("id", "b_id")
        .withColumnRenamed("cluster_id", "cb"), "b_id")
      .where(col("ca") =!= col("cb")).count()
    val nClusters = clusters.select("cluster_id").distinct().count()
    val totalShuffleMb = stages.map(_._2).sum / 1e6

    println(
      f"""{"metric":"cc_distrib","n_copies":$n,"docs":$nDocs,"verified_pairs":$nPairs,"pairs_build_s":$pairsS%.1f,"branch":"distributed_star","rounds":${stats.last.round},"initial_edges":${stats.head.edges},"dedup_clusters_s":$clusterS%.1f,"clustered_docs":$nRows,"clusters":$nClusters,"broken_pairs":$broken,"total_shuffle_write_mb":$totalShuffleMb%.1f,"rounds_detail":$roundsJs}""")
    spark.stop()
  }
}
