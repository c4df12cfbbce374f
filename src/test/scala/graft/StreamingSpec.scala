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

  test("frame sampling arithmetic") {
    val fs = Multimodal.frameSample(
      Multimodal.assets(spark, sf0001), frameBytes = 16, stride = 4)
      .where(col("asset_id") === 0L).collect()(0)
    val nFrames = fs.getInt(fs.fieldIndex("n_frames"))
    val nSampled = fs.getInt(fs.fieldIndex("n_sampled"))
    assert(nSampled == (nFrames + 3) / 4 || (nFrames == 0 && nSampled == 1))
  }
}
