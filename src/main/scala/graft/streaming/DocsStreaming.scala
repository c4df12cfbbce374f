package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.queries.DedupQueries

/** Streaming near-duplicate detection over a document stream: the
  * stateful form of the batch MinHash+LSH pipeline. Band signatures are
  * the SAME map-side expressions as the batch path
  * ([[DedupQueries.bandedSignaturesMd5]]); the batch self-join on
  * (band_idx, band_val) becomes a `flatMapGroupsWithState` keyed by the
  * band bucket, whose state is the set of document ids previously seen
  * in that bucket — each arriving document emits a candidate pair per
  * prior bucket member: exactly the pairs the batch join would produce,
  * as long as no bucket exceeds [[MaxBucketState]] members (beyond the
  * cap, pairs against the evicted oldest members are dropped — see the
  * scale note below).
  *
  * Scale shape: state is partitioned by bucket key across executors and
  * bounded per bucket ([[MaxBucketState]]): a bucket hotter than that is
  * a degenerate near-dup cluster — its members are already known
  * duplicates of each other, so capping loses only redundant pairs (the
  * cap is the streaming analogue of the batch pipeline's skew guard). In
  * production the state would additionally carry an event-time timeout
  * so cold buckets age out; the test harness uses NoTimeout.
  */
object DocsStreaming {

  final case class BandRow(band_idx: Int, band_val: String, doc_id: Long)
  final case class BucketState(ids: List[Long])
  final case class CandPair(a_id: Long, b_id: Long)

  /** Per-bucket cap on remembered members — the ONE bucket-cap
    * constant, shared with the batch band join's l-side cap
    * ([[DedupQueries.MaxBandBucket]]) so stream and batch bound the
    * same degenerate bucket identically. (ADMISSION order differs by
    * construction: the stream admits the FIRST cap members to arrive
    * — within a micro-batch, smallest ids first — and later arrivals
    * emit nothing; the batch keeps the smallest cap doc_ids overall
    * but still pairs every member with the bucket's rank-1 member.
    * Both rules are no-ops while buckets stay within the cap — the
    * StreamingSpec equality gate — and past it the divergence is
    * pinned exactly by the cap-binding StreamingSpec gates.)
    */
  val MaxBucketState: Int = DedupQueries.MaxBandBucket

  /** Streaming read of the documents parquet (test stand-in for a
    * Kafka/file crawl feed).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** LSH candidate pairs as they arrive. Pairs duplicated across bands
    * (a doc pair can collide in several bands) are emitted per band —
    * downstream consumers `dropDuplicates` within their watermark, just
    * as the batch form does globally.
    */
  def lshCandidates(docs: DataFrame): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    DedupQueries.bandedSignaturesMd5(docs)
      .select(col("band_idx"), col("band_val"), col("doc_id"))
      .as[BandRow]
      .groupByKey(r => (r.band_idx, r.band_val))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.ids).getOrElse(Nil)
          // sort new arrivals so within-batch pair emission is
          // deterministic regardless of shuffle arrival order
          // the cap bounds WITHIN-BATCH emission too, not just stored
          // state: a degenerate bucket landing in one trigger would
          // otherwise emit n(n-1)/2 pairs into a single in-memory
          // builder (the batch twin bounds the same bucket at its
          // l-side cap) — beyond the cap, extra members of an
          // already-saturated near-dup cluster add only redundant pairs
          val fresh = rows.map(_.doc_id).toArray.distinct.sorted
            .filterNot(prior.contains)
            .take(math.max(0, MaxBucketState - prior.size))
          val out = Seq.newBuilder[CandPair]
          var seen = prior
          fresh.foreach { id =>
            seen.foreach { p =>
              out += (if (p < id) CandPair(p, id) else CandPair(id, p))
            }
            seen = id :: seen
          }
          state.update(BucketState(seen.take(MaxBucketState)))
          out.result().iterator
      }
  }

  /** Materialized form for tests/catalog: the distinct candidate pair
    * set the stream has emitted, sorted.
    */
  def lshCandidatesQuery(spark: SparkSession, dir: String): DataFrame =
    EventsStreaming.runToCompletion(spark,
      lshCandidates(readDocs(spark, dir)).toDF(),
      EventsStreaming.sinkName("stream_lsh_cand", dir),
      OutputMode.Append())
      .dropDuplicates("a_id", "b_id")
      .orderBy(col("a_id"), col("b_id"))

  /** Streaming Count-Min sketch over the document token stream: the
    * SAME cell expressions as the batch build
    * ([[graft.operators.CountMin.build]] — pure columns, so they apply
    * to a streaming frame unchanged), maintained by a Complete-mode
    * aggregation. The running state IS the sketch: ≤ depth×width
    * integer cells regardless of stream length (the sketch's bounded-
    * memory property is exactly what makes it streaming-safe), and
    * because cells are integer sums, micro-batch boundaries cannot
    * change any cell — stream == batch bit-for-bit.
    */
  def cmsCellsQuery(spark: SparkSession, dir: String): DataFrame = {
    val toks = readDocs(spark, dir)
      .select(explode(graft.queries.TextQueries.tokens(col("text")))
        .as("token"))
    EventsStreaming.runToCompletion(spark,
      graft.operators.CountMin.build(toks, "token", depth = 4, width = 1024),
      EventsStreaming.sinkName("stream_cms", dir))
      .orderBy(col("fn"), col("cell"))
  }

  /** Stateless streaming sampling: the deterministic content-hash
    * selection ([[graft.operators.Sampling.hashSample]]) is a pure
    * map-side predicate, so it applies to the stream unchanged — the
    * split-the-crawl-as-it-lands shape (train/val assignment at ingest
    * time). Zero streaming state; selection is content-keyed, so the
    * SAME documents are kept regardless of arrival order, micro-batch
    * slicing, restarts, or whether the pipeline runs batch or
    * streaming — the property that makes the split reproducible and
    * prefix-nested (a later 10% re-crawl sample contains this 25% run's
    * docs' 10% subset). Shares the batch oracle verbatim.
    */
  def hashSampleQuery(spark: SparkSession, dir: String): DataFrame =
    EventsStreaming.runToCompletion(spark,
      graft.operators.Sampling.hashSample(
          readDocs(spark, dir), col("text"), 0.25)
        .select(col("doc_id"), col("lang"), col("source")),
      EventsStreaming.sinkName("stream_sample", dir),
      OutputMode.Append())
      .orderBy(col("doc_id"))

  /** Stateless streaming quality scoring: each arriving document is
    * scored map-side with the broadcast classifier trained ONCE on the
    * static corpus ([[graft.queries.CurationQueries.classifierModel]])
    * — the filter-the-crawl-as-it-lands shape. Zero streaming state, so
    * micro-batch boundaries cannot change any score; StreamingSpec
    * asserts the stream output EQUALS the batch scoring of the same
    * table with the same model.
    */
  def qualityScoresQuery(spark: SparkSession, dir: String): DataFrame = {
    val model = graft.queries.CurationQueries.classifierModel(spark, dir)
    val docs = readDocs(spark, dir)
      .withColumn("toks", graft.queries.TextQueries.tokens(col("text")))
    val scored = docs
      .withColumn("p", graft.operators.LinearClassifier
        .scoreCol(docs, col("toks"), model))
      .select(col("doc_id"), col("lang"), round(col("p"), 6).as("p"))
    EventsStreaming.runToCompletion(spark, scored,
      EventsStreaming.sinkName("stream_quality", dir), OutputMode.Append())
      .orderBy(col("doc_id"))
  }
}
