package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted/two-phase aggregation equals the direct form. */
class SkewSpec extends SparkSpec {

  /** VERDICT r10 #6: the ANN-join path under a pathologically hot
    * centroid — one cluster holding ~50% of the corpus, the realistic
    * near-duplicate-corpus shape. The search shape (driver-sized query
    * batch) broadcasts the probed side, so corpus rows never shuffle by
    * centroid and the hot cell cannot straggle; the shape that CAN is
    * corpus×corpus mining (hard negatives), where the join shuffles
    * both sides on centroid_id and the hot cell lands on one reducer.
    * The engine's answer is Spark-idiomatic: the join is a plain
    * equi-join on a real column, so AQE's OptimizeSkewedJoin can split
    * the oversized partition at runtime — PROVIDED nothing in annJoin's
    * plan (probe UDF, TopNByKey partial agg) blocks it. That
    * "AQE-splittable by construction" property is what this gate pins,
    * with thresholds scaled down to test size:
    *   1. results under the skew-split plan == broadcast-path truth
    *      (and under the unsplit shuffled plan — three plans, one
    *      answer);
    *   2. the executed plan shows the skew-handled sort-merge join;
    *   3. a DIFFERENTIAL task-time straggler bound: the same join with
    *      the skew split disabled runs the hot cell as one dominant
    *      task; enabling it must at least halve the max task time
    *      (observed ~4×). Differential, so box speed cancels out.
    */
  test("annJoin under a 50%-hot centroid: AQE splits the skewed join, " +
      "no straggler partition (VERDICT r10 #6)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // Construct the hot cell the way production GETS one: build on a
    // well-spread corpus (retraining balances cells by design — a
    // straight build on 50%-duplicated data lets reseeding split the
    // ball over many centroids), then APPEND a near-duplicate flood.
    // append() assigns to EXISTING centroids without retraining, so all
    // 5000 clones route to the one centroid nearest the ball — the
    // drift shape (add-after-train) the index contract documents.
    val d = 16
    val spread = (0 until 5000).map { i =>
      (i.toLong, Array.tabulate(d)(_ => rnd.nextFloat() * 100f))
    }
    val ball = (5000 until 10000).map { i =>
      (i.toLong, Array.tabulate(d)(_ => 1.0f + rnd.nextFloat() * 1e-4f))
    }
    val emb = spark.createDataset(spread).toDF("vec_id", "embedding")
      .repartition(8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skew_ann").toString
    val built = graft.operators.Ivf.build(emb, "vec_id", "embedding", dir)
    // append under production-like write parallelism: writeVectors salts
    // the shuffle by (shard_id, hash(id) % ceil(parts/shards)), so with
    // parts ≫ shards the hot cell lands in MULTIPLE files — which is
    // what later gives AQE map-output granularity to split the hot
    // partition (skew split cannot cut below one mapper's output). At 8
    // test partitions salts=1 and the whole ball would be one file/one
    // mapper — a test-scale artifact, not the 100 TB layout.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try graft.operators.Ivf.append(built,
      spark.createDataset(ball).toDF("vec_id", "embedding").repartition(8),
      "vec_id", "embedding")
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    val idx = built
    val cells = spark.read.parquet(idx.vectorsPath)
      .groupBy("centroid_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val hotFrac = cells.map(_._2).max / 10000.0
    assert(hotFrac >= 0.4,
      s"hot-cell construction failed: max cell holds only $hotFrac")
    // queries: the corpus-mining shape — DIVERSE perturbed corpus
    // points, half from the ball (those all probe the hot cell) and
    // half spread (those probe their local cells); 2000 identical
    // clone queries would instead pile the PROBE side of a few cells
    // into one partition, a degenerate shape no mining workload has
    val queries = spark.createDataset(
      (0 until 1000).map { i =>
        (100000L + i, Array.tabulate(d)(_ => 1.0f + rnd.nextFloat() * 1e-4f))
      } ++ (1000 until 2000).map { i =>
        (100000L + i, Array.tabulate(d)(_ => rnd.nextFloat() * 100f))
      }).toDF("query_id", "qe").repartition(8)

    def run(): Seq[(Long, Int, Long)] =
      graft.operators.Ivf.annJoin(queries, idx, k = 5, nProbe = 20)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted

    val truth = run() // default confs: probed side broadcasts

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // AQE's skew split cannot cut below one MAPPER's output, and at
      // this test scale the whole appended ball fits one parquet file;
      // at 100 TB a shard spans many file splits, so model that by
      // forcing multiple scan splits over the hot file
      "spark.sql.files.maxPartitionBytes" -> "65536")
    val saved = (confs.map(_._1) :+ "spark.sql.adaptive.skewJoin.enabled")
      .map(k => k -> spark.conf.getOption(k))
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    /** Run the shuffled (non-broadcast) annJoin and return (results,
      * max task runtime ms, max task shuffle-read bytes, final plan).
      */
    def measured(skewEnabled: Boolean)
        : (Seq[(Long, Int, Long)], Long, Long, String) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewEnabled.toString)
      val tasks =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) tasks.add(
            (m.executorRunTime, m.shuffleReadMetrics.totalBytesRead))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val df = graft.operators.Ivf.annJoin(queries, idx, k = 5, nProbe = 20)
        val res = df.collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
        var last = -1
        var stable = 0
        var iters = 0
        while (stable < 3 && iters < 50) { // wait for metrics to drain
          Thread.sleep(100)
          iters += 1
          if (tasks.size == last) stable += 1
          else { stable = 0; last = tasks.size }
        }
        import scala.jdk.CollectionConverters._
        (res, tasks.asScala.map(_._1).max, tasks.asScala.map(_._2).max,
          df.queryExecution.executedPlan.toString)
      } finally spark.sparkContext.removeSparkListener(listener)
    }

    try {
      val (unsplitRes, unsplitMs, unsplitB, _) = measured(skewEnabled = false)
      val (splitRes, splitMs, splitB, plan) = measured(skewEnabled = true)
      // 1. correctness: both shuffled plans equal the broadcast truth
      assert(unsplitRes == truth, "shuffled SMJ diverges from truth")
      assert(splitRes == truth, "skew-split plan diverges from truth")
      // 2. the final adaptive plan shows the skew-handled SMJ — a plan
      // shape (custom operator, misplaced required distribution) that
      // blocked OptimizeSkewedJoin would silently regress this
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on the hot centroid:\n" +
          plan.linesIterator.take(30).mkString("\n"))
      // 3. the straggler bound, DIFFERENTIAL and DETERMINISTIC: gate on
      // max shuffle-read BYTES per task — data volume, immune to box
      // load and GC — not wall clock. With the split disabled the whole
      // hot cell × its probes is read by ONE join task (observed
      // ~1.85 MB); with it enabled that read is split, and the global
      // max drops to the DOWNSTREAM per-query top-k stage's largest
      // task (~1.17 MB, untouched by the join split — the listener
      // sees every stage, so that stage is the post-split floor).
      // Observed ratio 0.63; gate at ≤ 0.75. Wall-clock ratio stays a
      // logged diagnostic only (observed ~0.26 idle; flake-prone under
      // load — VERDICT r11 advice).
      println(s"SKEW maxTask: unsplit=${unsplitMs}ms/${unsplitB}B " +
        s"split=${splitMs}ms/${splitB}B " +
        s"timeRatio=${splitMs.toDouble / math.max(1L, unsplitMs)}")
      assert(unsplitB >= 131072L,
        s"scenario not pathological: unsplit max task read only $unsplitB B")
      assert(splitB * 4 <= unsplitB * 3,
        s"straggler remains: split max task reads $splitB B " +
          s"vs unsplit $unsplitB B (ratio > 0.75)")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("degenerate write parallelism (shuffle.partitions <= numShards) " +
      "auto-raises to >=2 files per shard; healthy config untouched " +
      "(VERDICT r11 #7, upgraded warn->fix per r16 #4)") {
    import spark.implicits._
    import graft.operators.Ivf
    // 4000 rows so every (shard, salt) bucket is populated — the gate
    // below counts FILES per shard, and an empty salt bucket writes none
    val df = (0L until 4000L).map(i => (i, (i % 8).toInt, (i % 4).toInt))
      .toDF("vec_id", "centroid_id", "shard_id")
    val out = java.nio.file.Files.createTempDirectory("graft_salt_warn")
      .toString
    def filesPerShard(dir: String): Map[String, Int] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("shard_id="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // shuffle.partitions (4) <= numShards (4): pre-r17 this degraded to
    // one salt → one file per shard, the exact config SCALE.md §r11-skew
    // showed leaves a hot cell as a single unit AQE cannot split
    Ivf.lastWriteParallelismWarning = None
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try Ivf.writeVectors(df, "vec_id", 4, s"$out/v1", "overwrite")
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val note = Ivf.lastWriteParallelismWarning
    assert(note.exists(_.contains("auto-raised")),
      s"degenerate write parallelism must record the auto-raise, got $note")
    assert(note.exists(_.contains("numShards=4")))
    val fps = filesPerShard(s"$out/v1")
    assert(fps.size == 4 && fps.values.forall(_ >= 2),
      s"auto-raise must leave every shard with >=2 files, got $fps")
    // healthy config: pin partitions explicitly (16 partitions, 4
    // shards → 4 salts) rather than relying on the suite default, so a
    // future SparkSpec partitions change cannot flip this branch
    Ivf.lastWriteParallelismWarning = None
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try Ivf.writeVectors(df, "vec_id", 4, s"$out/v2", "overwrite")
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(Ivf.lastWriteParallelismWarning.isEmpty,
      "healthy write parallelism must not record an auto-raise")
  }

  test("two-phase count-distinct equals countDistinct") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy(col("l_returnflag").as("__key"))
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(
      li, col("l_returnflag"), col("l_partkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
  }

  test("two-phase count-distinct keeps all-NULL keys with count 0") {
    import spark.implicits._
    val df = Seq(("a", None: Option[Int]), ("a", None), ("b", Some(1)))
      .toDF("k", "v")
    val direct = df.groupBy(col("k").as("__key"))
      .agg(countDistinct(col("v")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(df, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
    assert(twoPhase("a") == 0L)
  }

  test("two-phase count-distinct counts NULL keys' non-null values") {
    // groupBy groups NULL keys together, but a null-unsafe re-attach join
    // would never match NULL = NULL and report 0 — must use <=>
    import spark.implicits._
    val df = Seq((Some("a"), Some(1)), (None: Option[String], Some(1)),
      (None, Some(2)), (None, None: Option[Int]))
      .toDF("k", "v")
    val direct = df.groupBy(col("k").as("__key"))
      .agg(countDistinct(col("v")).as("n_distinct"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val twoPhase = Skew.countDistinctTwoPhase(df, col("k"), col("v"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(twoPhase == direct)
    assert(twoPhase(None) == 2L)
  }

  test("salted collect_set equals direct collect_set") {
    val li = Tables.lineitem(spark, sf0001).where(col("l_suppkey") < 4)
    val direct = li.groupBy(col("l_suppkey").as("__key"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("values"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val salted = Skew.saltedCollectSet(
      li, col("l_suppkey"), col("l_partkey"), nSalts = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct)
  }

  test("salted join equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one hot key — the shape AQE skew-join or
    // manual salting exists for
    val left = (0 until 2000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 999L, i.toLong)
    }.toDF("k", "row_id")
    val right = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k"))
      .select("k", "row_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "k",
      saltBy = col("row_id"), nSalts = 8)
      .select("k", "row_id", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    // the salt actually spreads the hot key over multiple salt values
    val spread = left.where(col("k") === 999L)
      .withColumn("s", pmod(xxhash64(col("row_id")), lit(8)))
      .select("s").distinct().count()
    assert(spread > 4, s"hot key spread over only $spread salts")
    // the injected helper column must not clobber a caller's __salt
    intercept[IllegalArgumentException](Skew.saltedJoin(
      left.withColumn("__salt", lit(0)), right, "k", col("row_id")))
    intercept[IllegalArgumentException](Skew.saltedJoin(
      left, right.withColumn("__salt", lit(0)), "k", col("row_id")))
  }
}
