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
}
