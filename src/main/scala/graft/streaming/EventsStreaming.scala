package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events table: watermarked
  * tumbling-window aggregation and stateful sessionization. The reference
  * has no streaming surface (SURVEY.md §2.9); these are the north-star
  * stream equivalents of the batch EventQueries, and the batch/stream
  * parity test pins their semantics to the oracle-checked batch forms.
  *
  * At scale the same code runs against a file/Kafka source with
  * `trigger(ProcessingTime)`: state is partitioned by group key across
  * executors, watermark bounds state size, and the memory sink below is
  * only the test harness.
  */
object EventsStreaming {

  // dir-keyed, fingerprint-revalidated (ADVICE r15): bounded at one
  // entry per directory ever streamed, rebuilt when the data changes
  private val eventsSchemaMemo =
    new graft.Tables.DataKeyedMemo[org.apache.spark.sql.types.StructType]()

  /** Streaming read of the events parquet (schema must be supplied for
    * file-source streams; ts arrives as nanos-long and is normalized
    * exactly like Tables.events).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // tsAsLtz: a session without inferTimestampNTZ disabled would infer
    // NTZ for ts (no isAdjustedToUTC in the testdata parquet) and
    // withWatermark below would reject it — coerce in the supplied
    // schema, same as the batch reader. Memoized per data version
    // (Tables.dataKey convention): every stream query paid a batch
    // footer probe per call, twice per intervalJoinQuery (r15 review)
    val schema = eventsSchemaMemo.get(dir)(graft.Tables.tsAsLtz(
      spark.read.parquet(s"$dir/events.parquet").schema))
    // file-source streams take a directory; glob-filter to the one table
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Watermarked hourly tumbling counts per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class Ev(user_id: Long, ms: Long)
  final case class SessionState(lastMs: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful sessionization: 30-minute inactivity gap starts a new
    * session — mapGroupsWithState keyed by user, the streaming form of
    * the batch `user_sessions` window query. Events within a group are
    * sorted by time inside the state update (micro-batches may interleave
    * arrival order).
    */
  def sessionize(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), unix_millis(col("ts")).as("ms")).as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](
        GroupStateTimeout.NoTimeout()) {
        case (uid, evs, state: GroupState[SessionState]) =>
          val sorted = evs.map(_.ms).toArray.sorted
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { ms =>
            val newSession = s.lastMs == Long.MinValue || ms - s.lastMs > 1800000L
            // lastMs never regresses: a cross-batch LATE event (normal
            // under Kafka disorder) must not rewind the watermark-free
            // state — rewinding made the NEXT in-order event look like
            // a >30min gap and spuriously opened a session. Late events
            // are counted but cannot re-open the past.
            s = SessionState(math.max(ms, s.lastMs),
              s.nSessions + (if (newSession) 1 else 0),
              s.nEvents + 1)
          }
          state.update(s)
          UserSessions(uid, s.nSessions, s.nEvents)
      }.toDF()
  }

  /** EVENT-TIME sessionization twin (VERDICT r9 #7): the built-in
    * `session_window` aggregation merges sessions by event time, so a
    * LATE event lands in the session its timestamp belongs to — and can
    * legitimately BRIDGE two previously separate sessions into one —
    * where the arrival-order [[sessionize]] (whose monotone-lastMs
    * guard deliberately refuses to re-open the past) counts it against
    * the newest session. Below-disorder the two agree; under late data
    * this twin is the one that matches a batch recomputation
    * (StreamingSpec pins the divergence on a constructed bridge case).
    *
    * Boundary semantics differ from the lag-window form by design:
    * session windows are [start, last+gap), so a gap of EXACTLY the
    * 30-minute threshold starts a new session (`>=`), while the batch
    * lag form splits only on `>` — the twin's oracle mirrors `>=`.
    *
    * Scale shape: state is one (user, merged-session) row per open
    * session, partitioned by user across executors; with a watermark
    * (production) closed sessions emit in Append mode and their state
    * is dropped. The finite test harness runs Complete mode instead —
    * the final watermark never passes the last session, so Append
    * would hold back every user's trailing session.
    */
  def sessionizeEventTime(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"))

  /** PRODUCTION form of [[sessionizeEventTime]]: watermark + Append.
    * A session window emits exactly once — when the watermark passes
    * its end (last event + gap) — and its state is dropped, so state
    * stays bounded on an unbounded stream: the still-open tail of each
    * user's activity is the ONLY state held. The Complete-mode form
    * above exists because a finite test stream's watermark never
    * passes the trailing session, which Append would hold back forever
    * (the StreamingSpec gate shows exactly this split: closed sessions
    * emitted once, trailing session withheld).
    */
  def sessionizeEventTimeAppend(events: DataFrame,
      delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Catalog query: event-time sessions rolled up per user — the same
    * (user_id, n_sessions, n_events) surface as `stream_sessions`, so
    * the two entries' results differ only where event-time handling
    * does.
    */
  def sessionEventTimeQuery(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark,
      sessionizeEventTime(readEvents(spark, dir).where(col("user_id") < 200)),
      sinkName("stream_sessions_et", dir))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy(col("user_id"))

  /** Streaming exact dedup: first event per (user_id, event_type, hour)
    * — watermarked so state for past hours is dropped. The watermark is
    * declared ON the derived hour_start column AFTER it is added:
    * streaming dropDuplicates only builds a state-eviction predicate
    * when one of its key columns carries the event-time watermark
    * metadata, and a watermark on raw `ts` does not propagate through
    * the bucket expression — state would grow forever on a continuous
    * stream. Parity with the batch equivalent is asserted in
    * StreamingSpec.
    */
  def dedupFirstPerHour(events: DataFrame): DataFrame =
    events
      .withColumn("hour_start",
        timestamp_seconds(floor(unix_millis(col("ts")) / 3600000L) * 3600L))
      .withWatermark("hour_start", "2 hours")
      .dropDuplicates("user_id", "event_type", "hour_start")
      .select(col("user_id"), col("event_type"), col("hour_start"),
        col("event_id"))

  /** Catalog query: streaming exact dedup, keys only. Which ROW
    * survives `dropDuplicates` is arrival-order dependent (first seen
    * wins), but the surviving KEY SET is deterministic — so the
    * catalog/oracle surface is the keys, and the batch twin is a plain
    * DISTINCT.
    */
  def dedupQuery(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, dedupFirstPerHour(readEvents(spark, dir)),
      sinkName("stream_dedup", dir), OutputMode.Append())
      .select(col("user_id"), col("event_type"), col("hour_start"))
      .orderBy(col("user_id"), col("event_type"), col("hour_start"))

  /** Sliding-window counts: 1-hour windows advancing every 30 minutes —
    * each event lands in exactly 2 windows. Spark expands the event
    * into its window set map-side before the shuffle, so the shuffle
    * volume is (events × overlap), the same cost the batch form pays to
    * explode the window offsets.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Catalog query: streaming sliding-window counts, materialized. */
  def slidingQuery(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, slidingCounts(readEvents(spark, dir)),
      sinkName("stream_sliding", dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Streaming HLL distinct: approximate distinct users per event type
    * as a streaming max-aggregate over [[graft.operators.Hll]]
    * registers. Registers are monotone under max-merge, so micro-batch
    * slicing and arrival order cannot change any register — stream ==
    * batch bit-for-bit (StreamingSpec), and the stream shares the
    * batch register oracle. Streaming state is bounded at m=256
    * register rows per event type regardless of stream length — the
    * sketch's streaming-safety property, same as the CMS cells query.
    */
  def hllUsersQuery(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Hll.estimate(
      runToCompletion(spark,
        graft.operators.Hll.sketch(
          readEvents(spark, dir).select(col("event_type"), col("user_id")),
          "event_type", col("user_id")),
        sinkName("stream_hll", dir)),
      "event_type", "approx_users")
      .orderBy(col("event_type"))

  /** Streaming quantile sketch: p50/p95 of event value (exact cents)
    * per event type from a [[graft.operators.QuantileSketch]]
    * maintained as a Complete-mode streaming count-aggregate. Bucket
    * counts are integer sums, so micro-batch slicing and arrival order
    * cannot change any bucket — the streamed sketch equals the batch
    * sketch bit-for-bit (StreamingSpec), and the quantile read happens
    * once on the final registers, sharing the batch oracle. Streaming
    * state is bounded at ≤ ~1.8k bucket rows per event type for ANY
    * stream length (≤ 2^(SigBits−1) buckets per power of two) — the
    * same streaming-safety property as the CMS and HLL queries.
    */
  def quantilesQuery(spark: SparkSession, dir: String): DataFrame =
    graft.operators.QuantileSketch.quantiles(
      runToCompletion(spark,
        graft.operators.QuantileSketch.sketch(
          readEvents(spark, dir).select(col("event_type"), col("value")),
          "event_type", round(col("value") * 100).cast("long")),
        sinkName("stream_quant", dir)),
      "event_type", 200.0,
      Seq("approx_p50" -> 0.5, "approx_p95" -> 0.95))
      .orderBy(col("event_type"))

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the preceding 30 minutes. Both sides carry a 1-hour
    * watermark and the join condition is a bounded event-time range, so
    * Spark can evict join state (clicks older than watermark − 30 min can
    * never match a future purchase) — state is bounded on an unbounded
    * stream, the requirement for stream-stream joins at scale. Inner
    * interval joins in Append mode emit exactly the batch-join result.
    */
  def intervalJoin(purchaseSrc: DataFrame, clickSrc: DataFrame): DataFrame = {
    val purchases = purchaseSrc.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = clickSrc.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        unix_millis(col("p_ts")).as("purchase_ms"),
        unix_millis(col("c_ts")).as("click_ms"))
  }

  /** Catalog query: streaming interval join, materialized. */
  def intervalJoinQuery(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark,
      intervalJoin(readEvents(spark, dir), readEvents(spark, dir)),
      sinkName("stream_interval", dir), OutputMode.Append())
      .orderBy(col("purchase_id"), col("click_id"))

  /** Stream-static enrichment: streamed purchases joined to a STATIC
    * per-user profile table — the standard dimension-lookup pattern.
    * The static side is planned as an ordinary (broadcastable) batch
    * relation re-resolved per micro-batch; no streaming state at all,
    * so this scales exactly like the batch join.
    */
  def enriched(stream: DataFrame, profile: DataFrame): DataFrame =
    stream.where(col("event_type") === "purchase")
      .join(profile, "user_id")
      .select(col("event_id"), col("user_id"), col("n_events"),
        col("first_ms"))

  /** Catalog query: stream-static enrichment, materialized. */
  def enrichedQuery(spark: SparkSession, dir: String): DataFrame = {
    val profile = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(unix_millis(col("ts"))).as("first_ms"),
        count(lit(1)).as("n_events"))
    runToCompletion(spark, enriched(readEvents(spark, dir), profile),
      sinkName("stream_enriched", dir), OutputMode.Append())
      .orderBy(col("event_id"))
  }

  /** Run a streaming DataFrame to completion against the static input and
    * return the final result from a memory sink (test/verify harness;
    * production would use a real sink + trigger).
    */
  /** Memory-sink table name for a catalog stream query: one shared
    * derivation (12 call sites) — sanitized like Tables.cacheDirName so
    * the identifier always parses (math.abs(Int.MinValue) is negative,
    * and a '-' in an unquoted identifier breaks spark.table()). The
    * sanitize alone is punctuation-LOSSY ('/a/sf0.1' and '/a/sf0_1'
    * collapse to one identifier — two concurrent dirs sharing a sink
    * name would have the second start() replace the first's temp view
    * mid-query), so true dir-distinctness comes from the appended md5
    * digest of the RAW dir (r15 review).
    */
  private[streaming] def sinkName(prefix: String, dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    prefix + "_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + digest
  }

  def runToCompletion(spark: SparkSession, streamed: DataFrame,
      name: String, mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // materialize the (bounded) result and DROP the sink's temp view:
    // MemorySink rows live on the driver, and a Verify pass over the
    // stream catalog used to pin one resident copy of every stream
    // result per (query, dir) until JVM exit — clearCache() does not
    // touch temp views (r15 review). The local-relation return is the
    // same rows the sink already held on the driver, so peak memory
    // only drops.
    val rows = spark.table(name)
    val out = spark.createDataFrame(
      java.util.Arrays.asList(rows.collect(): _*), rows.schema)
    spark.catalog.dropTempView(name)
    out
  }

  /** Catalog query: streaming hourly counts, materialized. */
  def hourlyQuery(spark: SparkSession, dir: String): DataFrame =
    runToCompletion(spark, hourlyCounts(readEvents(spark, dir)),
      sinkName("stream_hourly", dir))
      .orderBy(col("hour_start"), col("event_type"))

  /** Catalog query: streaming sessionization, materialized. An
    * Update-mode memory sink keeps EVERY per-batch update, so if the file
    * source ever splits input into >1 micro-batch a user appears once per
    * batch; reduce to the final state per user. State counters are
    * cumulative (monotone non-decreasing), so the lexicographic max of
    * (n_events, n_sessions) is the last update.
    */
  def sessionQuery(spark: SparkSession, dir: String): DataFrame =
    // the user_id slice is pushed BELOW sessionize: per-user state is
    // independent, so filtering first shrinks streaming state and sink
    // rows to the sliced population (the DuckDB twin filters inside its
    // CTE the same way) instead of sessionizing everyone and discarding
    runToCompletion(spark,
      sessionize(readEvents(spark, dir).where(col("user_id") < 200)),
      sinkName("stream_sessions", dir),
      OutputMode.Update())
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("n_sessions"))).as("__last"))
      .select(col("user_id"), col("__last.n_sessions").as("n_sessions"),
        col("__last.n_events").as("n_events"))
      .orderBy(col("user_id"))
}
