package graft

import org.apache.spark.sql.functions._
import graft.queries.EventQueries
import graft.sources.Multimodal
import graft.streaming.EventsStreaming

/** Batch/stream parity + multimodal plumbing gates. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly counts equal the batch windowed aggregate") {
    val stream = EventsStreaming.hourlyQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = EventQueries.hourlyCounts(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("streaming sessionization equals the batch lag-window form") {
    val stream = EventsStreaming.sessionQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = EventQueries.userSessions(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("stream-stream interval join equals the batch range join") {
    val stream = EventsStreaming.intervalJoinQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf0001)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        unix_millis(col("p_ts")).as("purchase_ms"),
        unix_millis(col("c_ts")).as("click_ms"))
      .orderBy(col("purchase_id"), col("click_id"))
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  test("streaming ingest: foreachBatch appends into the IVF index") {
    // streamed vectors become searchable without a rebuild — the
    // streaming-ingest path of the incremental index (Ivf.append)
    import java.nio.file.{Files => JFiles}
    import graft.operators.{Ivf, KMeans}
    import org.apache.spark.sql.streaming.OutputMode
    val dir = JFiles.createTempDirectory("graft_stream_ivf").toString
    val emb = Tables.embeddings(spark, sf0001)
    val idx = Ivf.build(emb.where(col("vec_id") < 300), "vec_id", "embedding", dir)
    val schema = spark.read.parquet(s"$sf0001/embeddings.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sf0001)
      .where(col("vec_id") >= 300)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ivf.append(idx, batch, "vec_id", "embedding")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.awaitTermination(120000)
    val vecs = spark.read.parquet(idx.vectorsPath)
    assert(vecs.count() == 500L)
    assert(vecs.select("vec_id").distinct().count() == 500L)
    // probe-all search over the union == brute force over all 500
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = all.find(_._1 == 0L).get._2
    val brute = all.map { case (id, v) => (id, KMeans.sqDist(qv, v)) }
      .sortBy(p => (p._2, p._1)).take(10).map(_._1).toSeq
    val got = Ivf.search(spark, idx, qv, 10, 10000)
      .select("external_id").collect().map(_.getLong(0)).toSeq
    assert(got == brute)
  }

  test("streaming dedup keeps one event per (user, type, hour)") {
    import org.apache.spark.sql.streaming.OutputMode
    val out = EventsStreaming.runToCompletion(spark,
      EventsStreaming.dedupFirstPerHour(EventsStreaming.readEvents(spark, sf0001)),
      "stream_dedup_test", OutputMode.Append())
    val groups = out.groupBy("user_id", "event_type", "hour_start").count()
      .where(col("count") > 1).count()
    assert(groups == 0, "duplicates survived streaming dedup")
    // cardinality parity with the batch distinct
    val batchDistinct = Tables.events(spark, sf0001)
      .withColumn("hour_start",
        timestamp_seconds(floor(unix_millis(col("ts")) / 3600000L) * 3600L))
      .select("user_id", "event_type", "hour_start").distinct().count()
    assert(out.count() == batchDistinct)
  }

  test("streaming sliding-window counts equal the batch window expansion") {
    val stream = EventsStreaming.slidingQuery(spark, sf0001)
    // batch twin: explode each event into its 2 overlapping windows
    val batch = Tables.events(spark, sf0001)
      .select(explode(array(lit(0), lit(1))).as("i"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("window_start",
        timestamp_seconds(
          (floor(unix_millis(col("ts")) / 1800000L) - col("i")) * 1800L))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("sum_value"))
    assert(stream.collect().map(_.toSeq).toSeq ==
      batch.collect().map(_.toSeq).toSeq)
  }

  test("streaming CMS cells equal the batch sketch bit-for-bit") {
    import graft.streaming.DocsStreaming
    val stream = DocsStreaming.cmsCellsQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.CountMin.build(
        Tables.documents(spark, sf0001)
          .select(explode(graft.queries.TextQueries.tokens(col("text")))
            .as("token")),
        "token", depth = 4, width = 1024)
      .orderBy(col("fn"), col("cell"))
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("streaming HLL estimate equals the batch sketch bit-for-bit") {
    import graft.streaming.EventsStreaming
    val stream = EventsStreaming.hllUsersQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.Hll.estimate(
        graft.operators.Hll.sketch(
          Tables.events(spark, sf0001).select(col("event_type"), col("user_id")),
          "event_type", col("user_id")),
        "event_type", "approx_users")
      .orderBy(col("event_type"))
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("streaming quantile sketch equals the batch sketch bit-for-bit") {
    import graft.streaming.EventsStreaming
    val stream = EventsStreaming.quantilesQuery(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = graft.operators.QuantileSketch.quantiles(
        graft.operators.QuantileSketch.sketch(
          Tables.events(spark, sf0001).select(col("event_type"), col("value")),
          "event_type", round(col("value") * 100).cast("long")),
        "event_type", 200.0,
        Seq("approx_p50" -> 0.5, "approx_p95" -> 0.95))
      .orderBy(col("event_type"))
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("streaming hash sample keeps exactly the batch sample's documents") {
    import graft.streaming.DocsStreaming
    val stream = DocsStreaming.hashSampleQuery(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val batch = graft.operators.Sampling.hashSample(
        Tables.documents(spark, sf0001), col("text"), 0.25)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(stream == batch && stream.nonEmpty)
  }

  test("streaming dedup catalog keys equal the batch DISTINCT") {
    val stream = EventsStreaming.dedupQuery(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .withColumn("hour_start",
        timestamp_seconds(floor(unix_millis(col("ts")) / 3600000L) * 3600L))
      .select("user_id", "event_type", "hour_start").distinct()
      .orderBy(col("user_id"), col("event_type"), col("hour_start"))
    assert(stream.collect().map(_.toSeq).toSeq ==
      batch.collect().map(_.toSeq).toSeq)
  }

  private def batchLshCandidates(): Set[(Long, Long)] = {
    import graft.queries.DedupQueries
    val banded = DedupQueries
      .bandedSignaturesMd5(Tables.documents(spark, sf001)).persist()
    val batch = banded.as("l")
      .join(banded.as("r"), Seq("band_idx", "band_val"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    banded.unpersist()
    batch
  }

  test("streaming LSH candidates equal the batch band-join candidate set") {
    import graft.streaming.DocsStreaming
    val stream = DocsStreaming.lshCandidatesQuery(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = batchLshCandidates()
    assert(batch.nonEmpty, "corpus should produce LSH candidates")
    assert(stream == batch,
      s"stream-only: ${(stream -- batch).take(5)}; batch-only: ${(batch -- stream).take(5)}")
  }

  test("streaming LSH equality holds across multiple micro-batches (stateful path)") {
    // one file per trigger → 4 micro-batches: this drives the
    // prior-state branch (pairs between docs of DIFFERENT batches),
    // which the single-file source above never exercises
    import graft.streaming.{DocsStreaming, EventsStreaming}
    val stage = java.nio.file.Files
      .createTempDirectory("graft_stream_docs").toString
    val docs = Tables.documents(spark, sf001)
    docs.repartition(4).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val result = EventsStreaming.runToCompletion(spark,
      DocsStreaming.lshCandidates(stream).toDF(),
      "stream_lsh_multibatch",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .dropDuplicates("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = batchLshCandidates()
    assert(result == batch,
      s"stream-only: ${(result -- batch).take(5)}; batch-only: ${(batch -- result).take(5)}")
  }

  /** Run `body` with the session's state-store provider flipped to
    * RocksDB — the off-heap store a 100 TB-pipeline deployment needs
    * (VERDICT r10 #3): HDFSBackedStateStore keeps every key's state on
    * the executor HEAP, so pipeline-scale key cardinality (LSH buckets
    * over a corpus, per-user sessions) OOMs executors; RocksDB spills
    * to local disk with a bounded block cache. The conf is restored
    * afterward so sibling tests keep the default provider. Spark pins
    * the provider INTO the checkpoint's offset-log metadata, so each
    * gate's restart leg re-opens RocksDB state files — recovery, not
    * just first-run writes, is exercised.
    */
  private def withRocksDbStateStore[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming LSH state survives a checkpoint restart (fault tolerance)") {
    lshRestartGate(); ()
  }

  test("streaming LSH restart recovery holds under the RocksDB state " +
      "store (VERDICT r10 #3, flatMapGroupsWithState)") {
    val ckpt = withRocksDbStateStore { lshRestartGate() }
    assertProviderPinned(ckpt, "RocksDBStateStoreProvider")
  }

  /** The flatMapGroupsWithState recovery gate, shared by the default and
    * RocksDB providers. The streaming-at-scale property the in-session
    * tests can't see: a crashed/redeployed query must RECOVER its bucket
    * state from the checkpoint. Run the stream over half the corpus,
    * STOP the query, deliver the other half to a fresh query on the same
    * checkpoint — duplicate pairs straddling the restart are found only
    * if the first half's bucket membership was restored, and
    * exactly-once file-sink semantics mean no pair is lost or doubled.
    */
  private def lshRestartGate(): String = {
    import graft.streaming.DocsStreaming
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsh_restart").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val docs = Tables.documents(spark, sf001)
    val firstHalf = col("doc_id") % 2 === 0
    docs.where(firstHalf).write.mode("append").parquet(in)
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(in)
      val q = DocsStreaming.lshCandidates(stream).toDF()
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first half: builds bucket state, checkpointed
    docs.where(!firstHalf).write.mode("append").parquet(in)
    run() // NEW query instance recovers state + source offsets
    val result = spark.read.parquet(out)
      .dropDuplicates("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = batchLshCandidates()
    val evens = docs.where(firstHalf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val cross = batch.filter { case (a, b) =>
      evens.contains(a) != evens.contains(b) }
    assert(cross.nonEmpty,
      "no duplicate pair straddles the restart — the gate would be vacuous")
    assert(result == batch,
      s"stream-only: ${(result -- batch).take(5)}; " +
        s"batch-only (lost state?): ${(batch -- result).take(5)}")
    ckpt
  }

  /** The checkpoint's offset-log metadata must record the expected
    * provider — guards the RocksDB twins against a silently-ignored or
    * mistyped conf (the gate would then green-light the DEFAULT store).
    */
  private def assertProviderPinned(ckpt: String, providerFragment: String): Unit = {
    val offsets = new java.io.File(s"$ckpt/offsets").listFiles()
    assert(offsets != null && offsets.nonEmpty, s"no offset log at $ckpt")
    val text = offsets.map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(text.contains(providerFragment),
      s"offset log does not pin $providerFragment — the query ran on the default store")
  }

  test("event-time sessionize twin equals the batch session_window " +
      "recomputation (VERDICT r9 #7)") {
    import graft.streaming.EventsStreaming
    val streamed = EventsStreaming.sessionEventTimeQuery(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = EventsStreaming.sessionizeEventTime(
        Tables.events(spark, sf001).where(col("user_id") < 200))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("a LATE event bridges two sessions in the event-time twin; the " +
      "arrival-order form refuses to re-open the past — divergence pinned") {
    import graft.streaming.EventsStreaming
    import spark.implicits._
    import java.nio.file.{Files => JFiles, Paths}
    val root = JFiles.createTempDirectory("graft_sess_et").toString
    val in = s"$root/in"
    def ev(id: Long, min: Int): (Long, Long, java.sql.Timestamp) =
      (id, 7L, new java.sql.Timestamp(3600000L * 100 + min * 60000L))
    // one parquet file per delivery, modtimes forced apart so
    // maxFilesPerTrigger=1 replays them as two ordered micro-batches
    def write(rows: Seq[(Long, Long, java.sql.Timestamp)], mt: Long): Unit = {
      val known = Option(new java.io.File(in).listFiles())
        .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
      rows.toDF("event_id", "user_id", "ts")
        .repartition(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles()
        .filter(f => !known.contains(f.getName))
        .foreach(f => assert(f.setLastModified(mt),
          s"setLastModified failed for $f — batch ordering would be random"))
    }
    val now = System.currentTimeMillis()
    // delivery 1: t=0 and t=50min — a 50min gap, two event-time sessions
    write(Seq(ev(1, 0), ev(2, 50)), now - 600000L)
    // delivery 2: a LATE event at t=25min bridges them (gaps 25 and 25)
    write(Seq(ev(3, 25)), now)
    def src = spark.readStream
      .schema("event_id LONG, user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val qEt = EventsStreaming.sessionizeEventTime(src)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("sess_et_bridge").start()
    try qEt.processAllAvailable() finally qEt.stop()
    val et = spark.table("sess_et_bridge").count()
    val qAo = EventsStreaming.sessionize(src)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
      .format("memory").queryName("sess_ao_bridge").start()
    try qAo.processAllAvailable() finally qAo.stop()
    val ao = spark.table("sess_ao_bridge")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"n_sessions")).as("l"))
      .select($"l.n_sessions").head().getLong(0)
    // event-time merges the bridge to ONE session; the arrival-order
    // form's monotone-lastMs guard counts the late event against the
    // newest session and stays at 2 — exactly the divergence the
    // guard's comment documents
    assert(et == 1L, s"event-time twin must merge the bridge: $et")
    assert(ao == 2L, s"arrival-order form must NOT re-open the past: $ao")
    // and the twin equals a from-scratch batch recomputation
    val batchEt = EventsStreaming.sessionizeEventTime(
      spark.read.parquet(in)).count()
    assert(batchEt == 1L)
  }

  test("watermarked Append-mode session windows: closed sessions emit " +
      "exactly once, the open tail is withheld (production shape)") {
    import graft.streaming.EventsStreaming
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_sess_append").toString
    val in = s"$root/in"
    def ev(id: Long, min: Int): (Long, Long, java.sql.Timestamp) =
      (id, 9L, new java.sql.Timestamp(3600000L * 200 + min * 60000L))
    def write(rows: Seq[(Long, Long, java.sql.Timestamp)], mt: Long): Unit = {
      val known = Option(new java.io.File(in).listFiles())
        .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
      rows.toDF("event_id", "user_id", "ts")
        .repartition(1).write.mode("append").parquet(in)
      new java.io.File(in).listFiles()
        .filter(f => !known.contains(f.getName))
        .foreach(f => assert(f.setLastModified(mt),
          s"setLastModified failed for $f — batch ordering would be random"))
    }
    val now = System.currentTimeMillis()
    // trigger 1: one session (t=0, t=10; window [0, 40))
    write(Seq(ev(1, 0), ev(2, 10)), now - 600000L)
    // trigger 2: a much later event (t=120) advances the watermark to
    // 120−30=90min > 40 → the first session closes and emits; the
    // trailing session [120, 150) stays open and must NOT emit
    write(Seq(ev(3, 120)), now)
    val q = EventsStreaming.sessionizeEventTimeAppend(
        spark.readStream
          .schema("event_id LONG, user_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("sess_append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sess_append")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))
    assert(rows.length == 1,
      s"exactly the closed session must emit, got ${rows.toSeq}")
    val (uid, start, end, n) = rows.head
    val base = 3600000L * 200
    assert(uid == 9L && start == base && end == base + 40 * 60000L && n == 2L,
      s"closed session shape wrong: ${rows.head}")
  }

  test("cap-binding mega-bucket: stream and batch diverge exactly as " +
      "designed, both bounded (VERDICT r9 #4)") {
    // The documented validity precondition of the stream_lsh_candidates
    // oracle (≤ MaxBandBucket members per band bucket) was an
    // honor-system comment; this gate constructs a cap-BINDING corpus
    // and pins the designed divergence: the batch join caps its L side
    // at the `cap` smallest doc_ids but keeps every member paired with
    // the bucket's rank-1 member, while the stream admits only the
    // first `cap` members per bucket (within a batch: smallest ids
    // first) and emits nothing for later arrivals.
    import graft.streaming.{DocsStreaming, EventsStreaming}
    import graft.queries.DedupQueries
    import spark.implicits._
    val cap = DocsStreaming.MaxBucketState.toLong // == MaxBandBucket
    val m = cap + 6 // 70 identical docs → one mega-bucket in every band
    val text = "alpha beta gamma delta epsilon"
    val docs = (0L until m).map(i => (i, text)).toDF("doc_id", "text")

    val batchPairs = graft.operators.MinHashLsh.candidates(
        DedupQueries.bandedSignaturesMd5(docs)
          .withColumnRenamed("doc_id", "id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedBatch =
      (for { l <- 0L until cap; r <- (l + 1) until m } yield (l, r)).toSet
    assert(batchPairs == expectedBatch,
      "batch cap must keep the smallest-id L side against ALL members")
    (cap until m).foreach(i => assert(batchPairs.contains((0L, i)),
      s"past-cap member $i lost its rank-1 pairing in the batch join"))

    val stage = java.nio.file.Files
      .createTempDirectory("graft_lsh_cap").toString
    docs.repartition(1).write.mode("overwrite").parquet(stage)
    val streamPairs = EventsStreaming.runToCompletion(spark,
        DocsStreaming.lshCandidates(
          spark.readStream.schema(docs.schema).parquet(stage)).toDF(),
        "stream_lsh_cap_single",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .dropDuplicates("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedStream =
      (for { l <- 0L until cap; r <- (l + 1) until cap } yield (l, r)).toSet
    assert(streamPairs == expectedStream,
      "stream must emit exactly the pairs among the first cap admits")
    assert(streamPairs.subsetOf(batchPairs),
      "below-eviction the stream set must stay inside the batch set")
    // both bounded: C(cap,2) and cap·m − cap(cap+1)/2 — not C(m,2)
    assert(streamPairs.size == cap * (cap - 1) / 2)
    assert(batchPairs.size == cap * m - cap * (cap + 1) / 2)
  }

  test("cap admission is first-come across micro-batches; the batch twin " +
      "keeps the smallest ids — the designed eviction-order divergence") {
    import graft.streaming.DocsStreaming
    import graft.queries.DedupQueries
    import spark.implicits._
    val cap = DocsStreaming.MaxBucketState.toLong
    val text = "alpha beta gamma delta epsilon"
    // trigger 1: 40 large ids; trigger 2: 40 small ids. The stream
    // admits all of batch 1, then fills the remaining 24 slots with the
    // smallest of batch 2 (0..23) and rejects 24..39; the batch twin
    // over the same corpus keeps the smallest 64 ids overall.
    val d1 = (100L until 140L).map(i => (i, text)).toDF("doc_id", "text")
    val d2 = (0L until 40L).map(i => (i, text)).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_lsh_cap_mb").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    def run(): Unit = {
      val q = DocsStreaming.lshCandidates(
          spark.readStream.schema(d1.schema).parquet(in)).toDF()
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    d1.repartition(1).write.mode("append").parquet(in); run()
    d2.repartition(1).write.mode("append").parquet(in); run()
    val stream = spark.read.parquet(out).dropDuplicates("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val admitted = ((100L until 140L) ++ (0L until (cap - 40L))).toSet
    val expected = (for {
      a <- admitted; b <- admitted if a < b
    } yield (a, b)).toSet
    assert(stream == expected,
      s"stream admits first-come: missing=${(expected -- stream).take(5)} " +
        s"extra=${(stream -- expected).take(5)}")
    val batch = graft.operators.MinHashLsh.candidates(
        DedupQueries.bandedSignaturesMd5(d1.unionByName(d2))
          .withColumnRenamed("doc_id", "id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // id 30 arrived late and found the bucket saturated: in the batch
    // twin's smallest-64 L side, absent from the stream entirely
    assert(batch.exists { case (a, b) => a == 30L || b == 30L })
    assert(!stream.exists { case (a, b) => a == 30L || b == 30L })
    // ids 124/125 were admitted early by the stream but are outside the
    // batch twin's smallest-64 L side: paired in-stream, not in-batch
    assert(stream.contains((124L, 125L)) && !batch.contains((124L, 125L)))
  }

  test("sessionize state survives a checkpoint restart (mapGroupsWithState)") {
    sessionRestartGate(); ()
  }

  test("sessionize restart recovery holds under the RocksDB state store " +
      "(VERDICT r10 #3, mapGroupsWithState)") {
    val ckpt = withRocksDbStateStore { sessionRestartGate() }
    assertProviderPinned(ckpt, "RocksDBStateStoreProvider")
  }

  /** The mapGroupsWithState recovery gate, shared by the default and
    * RocksDB providers: LSH covers flatMapGroupsWithState; this one
    * proves mapGroupsWithState counters recover. Events are split at
    * the median timestamp so most users have sessions straddling the
    * restart — their final (n_sessions, n_events) is correct only if
    * lastMs/counters were restored (a lost state restarts every user at
    * zero sessions and double-counts the session that spans the
    * boundary).
    */
  private def sessionRestartGate(): String = {
    import graft.streaming.EventsStreaming
    val root = java.nio.file.Files
      .createTempDirectory("graft_sess_restart").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    val ev = Tables.events(spark, sf0001).where(col("user_id") < 200)
      .select(col("user_id"), col("ts"))
    val Array(row) = ev.agg(min(col("ts")), max(col("ts"))).collect()
    val midMs = (row.getTimestamp(0).getTime + row.getTimestamp(1).getTime) / 2
    val firstHalf = unix_millis(col("ts")) <= midMs
    ev.where(firstHalf).write.mode("append").parquet(in)
    val updates = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(in).schema).parquet(in)
      val q = EventsStreaming.sessionize(stream)
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val rows = df.collect()
          updates.synchronized {
            rows.foreach(r =>
              updates += ((r.getLong(0), r.getLong(1), r.getLong(2))))
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // first half: session counters built, checkpointed
    ev.where(!firstHalf).write.mode("append").parquet(in)
    run() // fresh query on the same checkpoint: state must recover
    // counters are cumulative (monotone) — the final per-user update is
    // the lexicographic max of (n_events, n_sessions)
    val stream = updates.groupBy(_._1).map { case (u, us) =>
      val last = us.maxBy(t => (t._3, t._2))
      u -> (last._2, last._3)
    }
    val batch = graft.queries.EventQueries.userSessions(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val straddlers = ev.where(firstHalf).select("user_id").distinct()
      .join(ev.where(!firstHalf).select("user_id").distinct(), "user_id")
      .count()
    assert(straddlers > 0, "no user straddles the restart — vacuous gate")
    assert(stream == batch,
      s"diverging users: ${(stream.toSet -- batch.toSet).take(3)} / " +
        s"${(batch.toSet -- stream.toSet).take(3)}")
    ckpt
  }

  test("streaming ANN equals batch annJoin across micro-batch splits") {
    import graft.streaming.VectorsStreaming
    val idx = graft.queries.IndexQueries.index(spark, sf0001)
    val queries = Tables.embeddings(spark, sf0001)
      .where(col("vec_id") < 30)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val batch = graft.operators.Ivf.annJoin(queries, idx, k = 3, nProbe = 10000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // 3 files, one per trigger → 3 micro-batches; per-query top-k is
    // row-local so the union must equal the batch answer exactly
    val stage = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_in").toString
    queries.repartition(3).write.mode("overwrite").parquet(stage)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_out").toString
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    VectorsStreaming.annSearchToPath(stream, idx, k = 3, nProbe = 10000, out)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}; batch-only: ${(batch -- streamed).take(5)}")
  }

  test("streaming ANN equals batch annJoin at PRUNED nProbe too") {
    // probe-all parity (above) can't see routing drift: pruned probes
    // exercise the shared ProbeRouter through the streaming path —
    // executor-side routing inside foreachBatch must match the batch
    // join's, micro-batch splits and all
    import graft.streaming.VectorsStreaming
    val idx = graft.queries.IndexQueries.index(spark, sf0001)
    val queries = Tables.embeddings(spark, sf0001)
      .where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val batch = graft.operators.Ivf.annJoin(queries, idx, k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val stage = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_pruned_in").toString
    queries.repartition(2).write.mode("overwrite").parquet(stage)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_pruned_out").toString
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    VectorsStreaming.annSearchToPath(stream, idx, k = 3, nProbe = 4, out)
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(5)}; batch-only: ${(batch -- streamed).take(5)}")
  }

  test("retried ANN micro-batch overwrites its own partition — no duplicates") {
    import graft.streaming.VectorsStreaming
    val idx = graft.queries.IndexQueries.index(spark, sf0001)
    val queries = Tables.embeddings(spark, sf0001)
      .where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_retry").toString
    VectorsStreaming.writeAnnBatch(queries, idx, 3, 10000, out, batchId = 7L)
    val once = spark.read.parquet(out).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // a replay of the SAME batch id (foreachBatch retry semantics) must
    // leave both the row set AND the row count unchanged — the append
    // sink this replaced would have doubled every row
    VectorsStreaming.writeAnnBatch(queries, idx, 3, 10000, out, batchId = 7L)
    val twice = spark.read.parquet(out).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(once.nonEmpty && twice == once)
  }

  test("streaming quality scores equal the batch scoring exactly") {
    import graft.streaming.DocsStreaming
    import graft.queries.{CurationQueries, TextQueries}
    val model = CurationQueries.classifierModel(spark, sf0001)
    val docs = Tables.documents(spark, sf0001)
      .withColumn("toks", TextQueries.tokens(col("text")))
    val batch = docs
      .withColumn("p", graft.operators.LinearClassifier
        .scoreCol(docs, col("toks"), model))
      .select(col("doc_id"), round(col("p"), 6).as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val streamed = DocsStreaming.qualityScoresQuery(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}")
  }

  test("multimodal assets carry binary payloads with typed metadata") {
    val df = Multimodal.assets(spark, sf0001)
    val schema = df.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = df.where(col("asset_id") === 1L).collect()(0)
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
  }

  test("decode is deterministic and batch-shaped") {
    val a = Multimodal.decode(Multimodal.assets(spark, sf0001))
      .orderBy("asset_id").collect().map(_.toSeq).toSeq
    val b = Multimodal.decode(Multimodal.assets(spark, sf0001))
      .orderBy("asset_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("features are fixed-dim and feed the vector pipeline") {
    val f = Multimodal.features(Multimodal.assets(spark, sf0001))
    val dims = f.select(size(col("features")).as("d")).distinct().collect()
    assert(dims.map(_.getInt(0)).toSeq == Seq(Multimodal.FeatureDim))
    // index-compatible: cosine pairs query runs on them
    assert(Multimodal.featureTopPairs(spark, sf0001).count() == 10)
  }

  test("watermark drops rows later than the delay across micro-batches") {
    // two files processed as two micro-batches (maxFilesPerTrigger=1):
    // batch 1 advances the watermark to (12:00 - 1h) = 11:00; batch 2
    // replays an event at 09:30 (< watermark → must be dropped from the
    // Append-mode windowed count) plus one at 09:30+3h (kept)
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    val stage = JFiles.createTempDirectory("graft_late").toString
    def writeFile(name: String, rows: Seq[(java.sql.Timestamp, String)],
        modMs: Long): Unit = {
      val tmp = JFiles.createTempDirectory("graft_late_w").toString
      rows.map { case (t, e) => (t, e, 1.0) }.toDF("ts", "event_type", "value")
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = JFiles.list(Paths.get(tmp)).iterator()
      var src: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) src = p
      }
      val dst = Paths.get(stage, name)
      JFiles.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      JFiles.setLastModifiedTime(dst, FileTime.fromMillis(modMs))
    }
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    writeFile("a.parquet",
      Seq((ts(9, 15), "click"), (ts(12, 0), "click")), 1000000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(stage)
    val counts = EventsStreaming.hourlyCounts(stream)
      .select(col("hour_start"), col("event_type"), col("n_events"))
    val q = counts.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("late_data_test").start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to 11:00
      writeFile("b.parquet",
        Seq((ts(9, 30), "click"), (ts(12, 30), "click")), 2000000L)
      q.processAllAvailable() // batch 2: the 09:30 replay is late
    } finally q.stop()
    val out = spark.table("late_data_test")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    // 09:00 window: only the on-time 09:15 row — the 09:30 replay
    // arrived behind the 11:00 watermark and was dropped
    assert(out("2026-01-01 09:00:00.0") == 1L,
      s"late row not dropped: $out")
  }

  test("multimodal features flow through the PQ compression path") {
    // the whole point of fixed-dim features: the SAME index operators
    // serve multimodal content — encode the extracted features with PQ
    // and confirm ADC self-retrieval
    import graft.operators.Pq
    val feats = Multimodal.features(Multimodal.assets(spark, sf0001))
      .select(col("asset_id"), col("features"))
    val dim = Multimodal.FeatureDim
    val model = Pq.train(feats, "features", dim, m = 8, ksub = 16,
      orderCol = Some("asset_id"))
    val q = feats.where(col("asset_id") === 1L)
      .select(col("features")).head().getSeq[Float](0).toArray
    val top = Pq.search(Pq.encode(feats, "features", model), "asset_id",
      "pq_code", model, q, 3).collect()
    assert(top.head.getLong(0) == 1L, s"self-retrieval failed: ${top.toSeq}")
  }

  test("frame sampling arithmetic") {
    val fs = Multimodal.frameSample(
      Multimodal.assets(spark, sf0001), frameBytes = 16, stride = 4)
      .where(col("asset_id") === 0L).collect()(0)
    val nFrames = fs.getInt(fs.fieldIndex("n_frames"))
    val nSampled = fs.getInt(fs.fieldIndex("n_sampled"))
    assert(nSampled == (nFrames + 3) / 4 || (nFrames == 0 && nSampled == 1))
  }

  test("stream index append: a replayed micro-batch is a no-op; batch " +
      "boundaries change neither placements nor answers (VERDICT r11 #6)") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_append").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    // two independent indexes trained on the same first-300 slice
    // (build is seed-deterministic → identical centroids/routing)
    val idxA = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val idxB = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/b")
    def ingest(idx: Ivf.Index, lo: Int, hi: Int, id: Long,
        markers: String): Boolean =
      VectorsStreaming.appendVectorBatch(idx,
        emb.where(col("vec_id") >= lo && col("vec_id") < hi),
        "vec_id", "embedding", id, markers)
    // A: the remaining 200 vectors in ONE batch; B: in THREE
    assert(ingest(idxA, 300, 500, 0L, s"$root/a_m"))
    assert(ingest(idxB, 300, 360, 0L, s"$root/b_m"))
    assert(ingest(idxB, 360, 430, 1L, s"$root/b_m"))
    assert(ingest(idxB, 430, 500, 2L, s"$root/b_m"))
    def placements(idx: Ivf.Index): Set[(Long, Int, Int)] =
      spark.read.parquet(idx.vectorsPath)
        .select("vec_id", "centroid_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val pA = placements(idxA)
    assert(pA.size == 500 && pA == placements(idxB),
      "vector→(centroid, shard) placement depends on batch boundaries")
    // REPLAY batch 1 on B (foreachBatch at-least-once): marker makes it
    // a no-op — false return, no duplicate rows, placements unchanged
    assert(!ingest(idxB, 360, 430, 1L, s"$root/b_m"),
      "replayed batch id was re-applied")
    assert(placements(idxB) == pA,
      "replayed batch duplicated rows into the index")
    // and the probe-all answers over the two ingest histories agree
    def search(idx: Ivf.Index): Seq[(Long, Int, Long, Double)] =
      Ivf.annJoin(
          emb.where(col("vec_id") >= 480)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          idx, k = 3, nProbe = 10000)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val sA = search(idxA)
    assert(sA.nonEmpty && sA == search(idxB))
    // non-vacuity: the top hit of a streamed-in query is itself — the
    // appended rows are genuinely in the searched index
    assert(sA.filter(_._2 == 1).forall(t => t._1 == t._3 && t._4 == 0.0))
  }

  test("maintained stream append: in-place compaction bounds file debt " +
      "while the held handle keeps serving, answers identical to the " +
      "uncompacted twin, replay still a no-op") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_maint").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    // seed-deterministic builds → identical centroids/routing, so any
    // divergence below is the maintenance path's fault
    val idxA = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val idxB = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/b")
    val cuts = Seq(300, 340, 380, 420, 460, 500)
    for ((Seq(lo, hi), i) <- cuts.sliding(2).zipWithIndex) {
      val batch = emb.where(col("vec_id") >= lo && col("vec_id") < hi)
      assert(VectorsStreaming.appendVectorBatchMaintained(idxA, batch,
        "vec_id", "embedding", i.toLong, s"$root/a_m", maxFilesPerShard = 2))
      assert(VectorsStreaming.appendVectorBatch(idxB, batch,
        "vec_id", "embedding", i.toLong, s"$root/b_m"))
    }
    val statsA = Ivf.maintenanceStats(spark, idxA)
    val statsB = Ivf.maintenanceStats(spark, idxB)
    // non-vacuity: the unmaintained twin really fragmented past the
    // threshold, so at least one in-place compact must have fired on A
    assert(statsB.filesPerShardMax > 2,
      s"twin did not fragment — the gate is vacuous: $statsB")
    assert(statsA.filesPerShardMax < statsB.filesPerShardMax,
      s"no compact fired on the maintained index: $statsA vs $statsB")
    assert(statsA.filesPerShardMax <= 3,
      s"maintained index kept file debt past threshold+1: $statsA")
    // completeness and placement equality through the directory swap
    def placements(idx: Ivf.Index): Set[(Long, Int, Int)] =
      spark.read.parquet(idx.vectorsPath)
        .select("vec_id", "centroid_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val pA = placements(idxA)
    assert(pA.size == 500 && pA == placements(idxB),
      "in-place compaction changed vector→(centroid, shard) placements")
    // the HELD handle (vectorsPath never changed) answers identically
    def search(idx: Ivf.Index): Seq[(Long, Int, Long, Double)] =
      Ivf.annJoin(
          emb.where(col("vec_id") >= 480)
            .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
          idx, k = 3, nProbe = 10000)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val sA = search(idxA)
    assert(sA.nonEmpty && sA == search(idxB),
      "maintained and unmaintained twins disagree after compaction")
    // replay through the MAINTAINED path: marker short-circuits before
    // both the append and the maintenance listing — no rows, no compact
    val filesBefore = statsA.dataFiles
    assert(!VectorsStreaming.appendVectorBatchMaintained(idxA,
      emb.where(col("vec_id") >= 460 && col("vec_id") < 500),
      "vec_id", "embedding", 4L, s"$root/a_m", maxFilesPerShard = 2),
      "replayed batch id was re-applied on the maintained path")
    assert(Ivf.maintenanceStats(spark, idxA).dataFiles == filesBefore
      && placements(idxA) == pA,
      "replay mutated the maintained index layout")
  }

  test("maintained append self-heals a missed compact: debt accumulated " +
      "outside the maintained path is cleared by the next applied batch") {
    // the scaladoc's crash-window claim — a crash after the marker but
    // before the compact just DEFERS it — reduced to its testable core:
    // the maintenance rule reads current state, not an increment, so
    // debt from appends that never ran maintenance (a crashed window,
    // an old client) is seen and cleared by the next maintained batch
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_heal").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    // accumulate file debt past the threshold WITHOUT maintenance
    // (plain appends stand in for the crashed-after-marker window)
    Seq((300, 360, 0L), (360, 420, 1L), (420, 460, 2L)).foreach {
      case (lo, hi, id) =>
        assert(VectorsStreaming.appendVectorBatch(idx,
          emb.where(col("vec_id") >= lo && col("vec_id") < hi),
          "vec_id", "embedding", id, s"$root/m"))
    }
    val debt = Ivf.maintenanceStats(spark, idx).filesPerShardMax
    assert(debt > 2, s"setup did not accumulate debt: $debt")
    // the next MAINTAINED batch sees the over-threshold listing and
    // compacts, even though its own append contributed one file
    // named knobs drive the full production signature (marker GC cadence
    // + lease sizing thread through to append and the in-place compact)
    assert(VectorsStreaming.appendVectorBatchMaintained(idx,
      emb.where(col("vec_id") >= 460), "vec_id", "embedding", 3L,
      s"$root/m", maxFilesPerShard = 2, markerRetention = 8,
      leaseStaleTtlMs = 60000L, leaseTimeoutMs = 60000L))
    val healed = Ivf.maintenanceStats(spark, idx)
    assert(healed.filesPerShardMax <= 2,
      s"deferred compact did not fire: $healed")
    assert(spark.read.parquet(idx.vectorsPath).count() == 500L,
      "self-healing compact lost rows")
  }

  test("maintenance loop: ingest with plain appends plus the production " +
      "poller converges to bounded file debt with no loss — and stop() " +
      "is clean") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_loop").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val loop = VectorsStreaming.startMaintenanceLoop(spark, idx,
      maxFilesPerShard = 2, pollIntervalMs = 100L)
    try {
      val cuts = Seq(300, 340, 380, 420, 460, 500)
      for ((Seq(lo, hi), i) <- cuts.sliding(2).zipWithIndex) {
        assert(VectorsStreaming.appendVectorBatch(idx,
          emb.where(col("vec_id") >= lo && col("vec_id") < hi),
          "vec_id", "embedding", i.toLong, s"$root/m"))
      }
      // the loop converges the debt without the ingest path ever
      // running a compact itself. Budget 120 s: under a full-suite run
      // (37 suites sharing the box) each poller compact can take
      // several seconds — the 60 s budget flaked exactly once there
      // while passing in isolation every time
      var waited = 0
      while (waited < 240 &&
          Ivf.maintenanceStats(spark, idx).filesPerShardMax > 2) {
        Thread.sleep(500); waited += 1
      }
      val stats = Ivf.maintenanceStats(spark, idx)
      assert(stats.filesPerShardMax <= 2,
        s"maintenance loop never converged the debt: $stats")
      assert(loop.compacts > 0, "loop reported no compacts")
      assert(loop.recentErrors.isEmpty,
        s"loop recorded errors: ${loop.recentErrors.map(_.getMessage)}")
    } finally loop.stop()
    val vecs = spark.read.parquet(idx.vectorsPath)
    assert(vecs.count() == 500L &&
      vecs.select("vec_id").distinct().count() == 500L,
      "maintenance loop lost or duplicated rows")
    // stop() is idempotent and the thread is gone
    loop.stop()
  }

  test("maintenance loop: stop() returns promptly from an idle poll wait") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_stop").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 100),
      "vec_id", "embedding", s"$root/a")
    // a production-cadence interval: a stop() that slept out the poll
    // would block its caller the full minute — the latch must wake the
    // idle wait immediately (an in-flight compact is still awaited by
    // contract, but this loop never accumulates debt, so any delay
    // here IS the idle wait)
    val loop = VectorsStreaming.startMaintenanceLoop(spark, idx,
      maxFilesPerShard = 1000000, pollIntervalMs = 60000L)
    Thread.sleep(200) // let the thread enter its wait
    val t0 = System.nanoTime()
    loop.stop()
    val stopMs = (System.nanoTime() - t0) / 1000000L
    assert(stopMs < 5000L,
      s"stop() blocked ${stopMs} ms against a 60 s poll interval")
  }

  test("streamed deletes: batches apply once; a replayed batch is a " +
      "no-op that leaves the sidecar fingerprint (and the materialized " +
      "debt) unchanged") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_del_stream").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val m = s"$root/m"
    val dels = emb.where(col("vec_id") < 300 && col("vec_id") % 7 === 3)
      .select(col("vec_id"))
    assert(VectorsStreaming.deleteVectorBatch(idx,
      dels.where(col("vec_id") < 150), "vec_id", 0L, m))
    assert(VectorsStreaming.deleteVectorBatch(idx,
      dels.where(col("vec_id") >= 150), "vec_id", 1L, m))
    val s0 = Ivf.maintenanceStats(spark, idx)
    assert(s0.tombstones == 43L, s"expected 43 streamed tombstones: $s0")
    // replay before compact: no sidecar growth, no fingerprint change
    assert(!VectorsStreaming.deleteVectorBatch(idx,
      dels.where(col("vec_id") < 150), "vec_id", 0L, m))
    assert(Ivf.maintenanceStats(spark, idx).tombstones == 43L)
    // the deleted ids are gone from search (vec 10 is a streamed delete)
    val q = emb.where(col("vec_id") === 10L)
      .select("embedding").head().getSeq[Float](0).toArray
    assert(!Ivf.search(spark, idx, q, 10, 10000).collect()
      .map(_.getLong(0)).contains(10L))
    // after a compact pays the debt, a REPLAYED delete must not
    // re-raise it — this is why delete ingest is marker-idempotent at
    // all (a replay is harmless to the anti-join but a fresh sidecar
    // file would spuriously flag unmaterialized debt forever after)
    assert(Ivf.maintain(spark, idx, maxFilesPerShard = 1000000)
      .isInstanceOf[Ivf.MaintainCompacted])
    assert(Ivf.maintenanceStats(spark, idx).unmaterializedTombstones == 0L)
    assert(!VectorsStreaming.deleteVectorBatch(idx,
      dels.where(col("vec_id") >= 150), "vec_id", 1L, m))
    val s1 = Ivf.maintenanceStats(spark, idx)
    assert(s1.unmaterializedTombstones == 0L,
      "a replayed delete batch re-raised materialized debt")
    // a genuinely NEW delete batch applies and re-raises the flag
    assert(VectorsStreaming.deleteVectorBatch(idx,
      emb.where(col("vec_id") === 0L).select("vec_id"), "vec_id", 2L, m))
    val s2 = Ivf.maintenanceStats(spark, idx)
    assert(s2.tombstones == 44L && s2.unmaterializedTombstones == 1L,
      s"precise debt count expected (only the NEW batch): $s2")
    // an EMPTY micro-batch (streams deliver them) marks applied but
    // writes NOTHING: the old DataFrame-delete path planted an empty
    // sidecar file, which changed the fingerprint and would spuriously
    // re-raise paid debt — the same failure class replay idempotence
    // exists to prevent, entering through the front door
    assert(VectorsStreaming.deleteVectorBatch(idx,
      emb.where(lit(false)).select("vec_id"), "vec_id", 3L, m))
    val s3 = Ivf.maintenanceStats(spark, idx)
    assert(s3.tombstones == 44L && s3.unmaterializedTombstones == 1L,
      s"an empty delete batch changed the sidecar: $s3")
  }

  test("marker GC bounds the idempotence ledger: rolled-up ids stay " +
      "no-op replays, the marker dir stays O(retention)") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_markers").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val m = s"$root/m"
    (0 until 10).foreach { i =>
      assert(VectorsStreaming.appendVectorBatch(idx,
        emb.where(col("vec_id") >= 300 + i * 20 &&
          col("vec_id") < 300 + (i + 1) * 20),
        "vec_id", "embedding", i.toLong, m, markerRetention = 4))
    }
    // ledger bounded: ten applied batches, at most ~retention markers
    // plus one watermark file survive
    val entries = new java.io.File(m).list().toSeq
    assert(entries.count(_.startsWith("batch_")) <= 5,
      s"marker GC did not bound the ledger: $entries")
    val uptos = entries.filter(_.startsWith("applied_upto_"))
    assert(uptos.length == 1, s"expected one watermark file: $entries")
    // a replayed id whose marker was GC'd is STILL a no-op (covered by
    // the watermark) — the idempotence contract survives the roll-up
    assert(!VectorsStreaming.appendVectorBatch(idx,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 320),
      "vec_id", "embedding", 0L, m, markerRetention = 4),
      "a rolled-up batch id was re-applied")
    // a recent id (marker may still exist) is a no-op too
    assert(!VectorsStreaming.appendVectorBatch(idx,
      emb.where(col("vec_id") >= 480),
      "vec_id", "embedding", 9L, m, markerRetention = 4))
    // and a genuinely new id applies
    assert(VectorsStreaming.appendVectorBatch(idx,
      emb.where(col("vec_id") >= 320 && col("vec_id") < 340)
        .withColumn("vec_id", col("vec_id") + 10000L),
      "vec_id", "embedding", 10L, m, markerRetention = 4))
    val vecs = spark.read.parquet(idx.vectorsPath)
    assert(vecs.count() == 520L &&
      vecs.select("vec_id").distinct().count() == 520L,
      "marker GC lost or duplicated rows")
  }

  test("maintained ingest recovers a crashed compact swap: the next " +
      "batch restores the trashed copy and applies (VERDICT r12 #1)") {
    import graft.streaming.VectorsStreaming
    import graft.operators.Ivf
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_crash").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    assert(VectorsStreaming.appendVectorBatchMaintained(idx,
      emb.where(col("vec_id") >= 300 && col("vec_id") < 400),
      "vec_id", "embedding", 0L, s"$root/m", maxFilesPerShard = 1000))
    // simulate the process dying between the swap's two renames — the
    // crash window whose recovery used to exist only as a comment
    intercept[RuntimeException] {
      Ivf.compactInPlace(spark, idx, betweenRenames =
        () => throw new RuntimeException("simulated crash"))
    }
    assert(!new java.io.File(idx.vectorsPath).exists(),
      "crash simulation did not leave the window state")
    // the NEXT maintained batch restores the trashed copy, applies its
    // rows, and the index is complete — no path ever served the
    // near-empty recreate the old code produced
    assert(VectorsStreaming.appendVectorBatchMaintained(idx,
      emb.where(col("vec_id") >= 400), "vec_id", "embedding", 1L,
      s"$root/m", maxFilesPerShard = 1000))
    val vecs = spark.read.parquet(idx.vectorsPath)
    assert(vecs.count() == 500L &&
      vecs.select("vec_id").distinct().count() == 500L,
      "recovery lost or duplicated rows")
    // and the recovered index answers searches over ALL its rows
    val got = Ivf.annJoin(
        emb.where(col("vec_id") >= 480)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe")),
        idx, k = 1, nProbe = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got.forall { case (q, hit) => q == hit },
      s"self-retrieval failed after crash recovery: $got")
  }

  test("maintained ingest defers its inline compact while out-of-band " +
      "maintenance holds the lease — the batch still applies") {
    import graft.streaming.VectorsStreaming
    import graft.operators.{FsLease, Ivf}
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_fence").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val idx = Ivf.build(emb.where(col("vec_id") < 300),
      "vec_id", "embedding", s"$root/a")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val lease = Ivf.maintainerLeasePath(idx)
    FsLease.acquire(fs, lease, "async-maintainer", timeoutMs = 0L)
    val debtBefore =
      try {
        // over-threshold batch: would compact inline, but the lease says
        // an async maintain owns the rewrite — the batch must APPLY and
        // the compact must defer, not fail the micro-batch
        assert(VectorsStreaming.appendVectorBatchMaintained(idx,
          emb.where(col("vec_id") >= 300 && col("vec_id") < 400),
          "vec_id", "embedding", 0L, s"$root/m", maxFilesPerShard = 0))
        assert(spark.read.parquet(idx.vectorsPath).count() == 400L,
          "batch did not apply while maintenance held the lease")
        val d = Ivf.maintenanceStats(spark, idx).filesPerShardMax
        assert(d > 0, "deferred compact should leave the file debt")
        d
      } finally FsLease.release(fs, lease, "async-maintainer")
    // lease released (maintenance done): the next batch compacts as usual
    assert(VectorsStreaming.appendVectorBatchMaintained(idx,
      emb.where(col("vec_id") >= 400), "vec_id", "embedding", 1L,
      s"$root/m", maxFilesPerShard = 0))
    val after = Ivf.maintenanceStats(spark, idx)
    assert(after.filesPerShardMax <= debtBefore,
      s"compact did not resume after the lease released: $after")
    assert(spark.read.parquet(idx.vectorsPath).count() == 500L)
  }

  test("stream_vectors_eventtime: late vectors are dropped from every " +
      "emitted count, the open tail is withheld, and kept windows equal " +
      "the batch recomputation (VERDICT r11 #1)") {
    import graft.streaming.VectorsStreaming
    val emitted = VectorsStreaming.eventTimeQuery(spark, sf0001)
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val baseMs = VectorsStreaming.EventTimeBase * 1000L
    // (a) the emitted window set is exactly hours 0–4: hour 5 (the
    // still-open tail) is withheld, and no (window, pos) emits twice —
    // a late row that re-opened evicted state would re-emit its window
    val hours = emitted.map(_._1).distinct.sorted.toSeq
    assert(hours == (0 to 4).map(h => baseMs + h * 3600000L),
      s"emitted windows must be exactly hours 0-4 (5 withheld): $hours")
    assert(emitted.map(t => (t._1, t._2)).distinct.length == emitted.length,
      "a (window, pos) emitted twice — late rows re-opened evicted state")
    // (b) non-vacuity: the late delivery exists (50 rows over hours
    // 0–2) and WOULD change the hour-0 count from 100 to 116 if
    // admitted; asserting the emitted count is exactly the on-time 100
    // is the late-drop proof
    val timed = VectorsStreaming.timedVectors(spark, sf0001)
    assert(timed.where(col("vec_id") >= 400 && col("vec_id") < 450)
      .count() == 50L, "late delivery missing — the gate would be vacuous")
    val h0 = emitted.filter(_._1 == baseMs).map(_._3).distinct.toSeq
    assert(h0 == Seq(100L),
      s"hour-0 count must be the on-time 100 (116 = late rows leaked): $h0")
    // (c) trigger-2's fresh hour-3 rows merged into the window trigger
    // 1 opened: 100 on-time + 17 fresh
    val h3 = emitted.filter(_._1 == baseMs + 3 * 3600000L)
      .map(_._3).distinct.toSeq
    assert(h3 == Seq(117L),
      s"hour-3 must merge on-time(100) + fresh(17) across triggers: $h3")
    // (d) every emitted (window, pos, count, mean) equals the batch
    // windowed aggregate over the kept set (on-time + non-withheld
    // fresh) — the same arithmetic, so means match bitwise
    val kept = timed.where(col("vec_id") < 400 ||
      (col("vec_id") >= 450 && col("vec_id") % 3 <= 1))
    val batch = kept
      .select(col("ts"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(window(col("ts"), "1 hour"), col("pos"))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("val").cast("double")), 4).as("mean_val"))
      .select(col("window.start"), col("pos"), col("n_vectors"),
        col("mean_val"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(emitted.toSet == batch.toSet,
      s"stream-only: ${(emitted.toSet -- batch.toSet).take(3)}; " +
        s"batch-only: ${(batch.toSet -- emitted.toSet).take(3)}")
  }
}
