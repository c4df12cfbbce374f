package graft

import java.nio.file.Files

/** Reference edge cases: high dimensions (kmeans_tests dim=1536,
  * shards_tests dim=512), huge external ids (u64::MAX-1000 analog), and
  * float precision roundtrip (shards_tests:459-503).
  */
class EdgeSpec extends SparkSpec {

  test("events.ts reads as TIMESTAMP, not TIMESTAMP_NTZ") {
    // the driver-generated parquet carries naive timestamps; without
    // inferTimestampNTZ=false in every session builder Spark 4 infers
    // NTZ, which breaks withWatermark and unix_millis across the
    // events/streaming surface (round-6 testdata regen incident)
    val t = Tables.events(spark, sf0001).schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType,
      s"events.ts inferred as $t — is inferTimestampNTZ disabled?")
  }

  test("events.ts stays TIMESTAMP even in a session that infers NTZ") {
    // a library user's DEFAULT session doesn't carry the repo's
    // inferTimestampNTZ=false config — the read-site schema coercion
    // (Tables.tsAsLtz) must keep the events surface working anyway
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val df = Tables.events(s2, sf0001)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"read-site coercion failed: ${df.schema("ts").dataType}")
    // same instants as the configured session (UTC contract): the
    // coercion relabels the stored micros, it must not shift them
    import org.apache.spark.sql.functions.{min, max, unix_millis, count}
    def sig(d: org.apache.spark.sql.DataFrame) =
      d.agg(count(org.apache.spark.sql.functions.lit(1)),
        min(unix_millis(org.apache.spark.sql.functions.col("ts"))),
        max(unix_millis(org.apache.spark.sql.functions.col("ts"))))
        .head().toSeq
    assert(sig(df) === sig(Tables.events(spark, sf0001)))
    // and the watermark path accepts it (the exact failure mode of the
    // round-6 incident was EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    val ws = graft.streaming.EventsStreaming.readEvents(s2, sf0001)
    assert(ws.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("dim=1536 training and search") {
    val rng = new scala.util.Random(5L)
    val recs = (0 until 60).map(i =>
      (i.toLong, Array.fill(1536)((rng.nextDouble() * 2 - 1).toFloat), 0L))
    val cfg = VectorIndexer.Config(dimension = 1536,
      indexDir = Files.createTempDirectory("graft_dim1536").toString)
    val vi = VectorIndexer.create(spark, cfg).buildFromRecords(recs)
    val rows = vi.search(recs(17)._2, k = 5, nProbe = 10000).collect()
    assert(rows.head.getLong(0) == 17L && rows.head.getDouble(1) == 0.0)
  }

  test("huge external ids preserved (Long.MaxValue - 1000)") {
    val base = Long.MaxValue - 1000
    val recs = (0 until 50).map(i =>
      (base + i, Array.tabulate(8)(j => (i * 8 + j) * 0.1f), 0L))
    val cfg = VectorIndexer.Config(dimension = 8,
      indexDir = Files.createTempDirectory("graft_hugeid").toString)
    val vi = VectorIndexer.create(spark, cfg).buildFromRecords(recs)
    val rows = vi.search(recs(30)._2, k = 3, nProbe = 10000).collect()
    assert(rows.head.getLong(0) == base + 30)
  }

  test("float precision values roundtrip exactly through the index") {
    val precise = Array(0.123456789f, -0.987654321f, 1234.5678f, 1e-7f)
    val recs = (0 until 30).map { i =>
      val v = if (i == 7) precise
        else Array.tabulate(4)(j => (i + j).toFloat)
      (i.toLong, v, 0L)
    }
    val cfg = VectorIndexer.Config(dimension = 4,
      indexDir = Files.createTempDirectory("graft_precise").toString)
    val vi = VectorIndexer.create(spark, cfg).buildFromRecords(recs)
    val row = vi.search(precise, k = 1, nProbe = 10000,
      includeVectors = true).collect()(0)
    assert(row.getLong(0) == 7L)
    assert(row.getSeq[Float](2).toArray.toSeq == precise.toSeq) // bit-exact
  }

  test("single-vector index") {
    // mirrors ivf_index_tests.rs:368-392
    val cfg = VectorIndexer.Config(dimension = 4,
      indexDir = Files.createTempDirectory("graft_single").toString)
    val vi = VectorIndexer.create(spark, cfg)
      .buildFromRecords(Seq((99L, Array(1f, 2f, 3f, 4f), 0L)))
    val rows = vi.search(Array(1f, 2f, 3f, 4f)).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 99L)
  }

  test("round-3 curation queries run at the tiny sf with non-empty output") {
    // sf0.001 documents is the same 500-row table as sf0.01 (only the
    // TPC-H tables shrink), so these assert cross-sf robustness of the
    // plans plus non-trivial output; the genuinely-empty branches
    // (empty batch / empty key side) are covered in BloomJoinSpec
    import graft.queries.Catalog
    for (q <- Seq("dedup_incremental_stats", "corpus_final_stats",
        "quality_deciles", "bigram_lm_top", "bloom_semi_revenue",
        "substring_dup_spans", "simhash_diverse_sample",
        "semantic_decontam", "source_mixture_weights",
        "training_shard_stats", "cms_token_counts",
        "mixture_apply_stats", "sparse_cosine_pairs",
        "source_token_divergence", "pii_scan_stats", "rule_filter_stats",
        "dsir_weights", "ivf_range_search", "docs_weighted_sample",
        "dedup_keep_best", "dedup_incremental_neardup",
        "stream_ann_search", "ann_pq_refine_topk")) {
      val n = Catalog.all(q).build(spark, sf0001).count()
      assert(n > 0, s"$q returned no rows at sf0.001")
    }
  }
}
