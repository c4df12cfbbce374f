package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode kernels are STUBS (this environment has no image/audio
  * codecs): `fakeDecode` derives deterministic pseudo-metadata and
  * `fakeFeatures` a deterministic pseudo-embedding from the payload
  * bytes. Everything around them — schema, binary payload handling,
  * partition-batch processing via mapPartitions (the Scala analog of
  * mapInPandas batching), fixed-dim feature output feeding the IVF
  * index — is real and tested. Swapping a real codec in changes only
  * the two marked functions.
  *
  * Scale shape: payloads stay distributed (never collected); per-batch
  * processing amortizes any per-partition model/codec init exactly as a
  * Pandas-UDF batch would; features are fixed-width float arrays so the
  * downstream index build is the same one used for text embeddings.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic synthetic multimodal table derived from documents:
    * payload = utf-8 text bytes, modality round-robins image/audio/video.
    * Stands in for `spark.read.format("binaryFile")` over an asset store.
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (pmod(col("doc_id") * 37, lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id") * 53, lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("raw").as("format")).as("meta"))

  /** First 60 bits of the payload's md5 as a non-negative long — the
    * same construction the dedup pipeline uses (`DedupQueries.md5Long`),
    * so the DuckDB oracle reproduces every derived value bit-for-bit.
    */
  private def md5Long60(s: String): Long =
    graft.functions.Md5Long60.compute(s.getBytes("UTF-8"))

  /** STUB decode: deterministic pseudo-decode of a binary payload.
    * A real implementation would parse the container format here; the
    * stand-in derives (width, height, channels) from the payload's md5
    * so the whole decode path is oracle-checkable.
    */
  private def fakeDecode(content: Array[Byte]): (Int, Int, Int) = {
    // hash the payload bytes directly — assets() constructs content as
    // valid UTF-8, so a decode-to-String round-trip produced identical
    // bytes at the cost of two allocations per row in the decode path
    val h = graft.functions.Md5Long60.compute(content)
    val w = (h % 1920 + 1).toInt
    val ht = (h / 1920 % 1080 + 1).toInt
    (w, ht, 3)
  }

  /** STUB feature extraction: deterministic pseudo-embedding from the
    * payload. A real implementation would run a vision/audio encoder per
    * batch; the stand-in hashes the payload per dimension (md5-derived,
    * oracle-reproducible).
    */
  private def fakeFeatures(content: Array[Byte]): Array[Float] = {
    val s = new String(content, "UTF-8")
    Array.tabulate(FeatureDim)(j =>
      ((md5Long60(s"$j:$s") % 1000000L) / 1000000.0).toFloat)
  }

  final case class Asset(asset_id: Long, modality: String, content: Array[Byte])
  final case class Decoded(asset_id: Long, modality: String,
      width: Int, height: Int, channels: Int, n_bytes: Long)
  final case class Featured(asset_id: Long, modality: String,
      features: Array[Float])

  /** Decode per partition batch — codec init happens once per partition
    * (the `it =>` prologue), not once per row.
    */
  def decode(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id"), col("modality"), col("content")).as[Asset]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { a =>
          val (w, h, c) = fakeDecode(a.content)
          Decoded(a.asset_id, a.modality, w, h, c, a.content.length.toLong)
        }
      }.toDF()
  }

  /** Feature extraction per partition batch → fixed-dim float array,
    * index-compatible with the text-embedding pipeline.
    */
  def features(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("asset_id"), col("modality"), col("content")).as[Asset]
      .mapPartitions { it =>
        // per-partition encoder init would go here
        it.map(a => Featured(a.asset_id, a.modality, fakeFeatures(a.content)))
      }.toDF()
  }

  /** Frame sampling: keep every `stride`-th fixed-size chunk of the
    * payload — pure column expressions, payload never leaves executors.
    */
  def frameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.withColumn("n_frames",
        floor(length(col("content")) / frameBytes).cast("int"))
      // a payload shorter than one frame has NOTHING to sample: the
      // zero-frame arm must emit an empty list, not sequence's
      // greatest-clamped [0] — that phantom frame made n_sampled exceed
      // n_frames, an impossible state for downstream sums (r15 review)
      .withColumn("sampled_frames",
        when(col("n_frames") === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("n_sampled", size(col("sampled_frames")))
      .select(col("asset_id"), col("modality"), col("n_frames"),
        col("n_sampled"))

  /** Catalog query: frame-sampling plumbing over the asset payloads —
    * 32-byte frames, keep every 4th. Pure column arithmetic (so it is
    * oracle-checked end to end); a real container parser replaces only
    * the byte-chunk framing.
    */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(assets(spark, dir), frameBytes = 32, stride = 4)
      .orderBy(col("asset_id"))

  /** Catalog query: per-modality decode + payload stats (deterministic,
    * oracle-checked — the decode kernel is md5-derived). Widths cast to
    * long for the DuckDB BIGINT schema compare.
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    decode(assets(spark, dir))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).cast("long").as("min_w"),
        max(col("height")).cast("long").as("max_h"))
      .orderBy(col("modality"))

  /** Catalog query: top self-similar asset pairs by pseudo-feature cosine
    * — proves the multimodal→vector→similarity pipeline end to end.
    */
  def featureTopPairs(spark: SparkSession, dir: String): DataFrame = {
    // filter BEFORE the mapPartitions kernel: Catalyst cannot push a
    // predicate through the opaque typed lambda, so filtering after it
    // would run the (expensive, per-row) encoder over the whole corpus
    // to keep 60 rows
    val f = features(assets(spark, dir).where(col("asset_id") < 60))
    val a = f.select(col("asset_id").as("a_id"), col("features").as("a_f"))
    val b = f.select(col("asset_id").as("b_id"), col("features").as("b_f"))
    a.crossJoin(b).where(col("a_id") < col("b_id"))
      .withColumn("cos_sim",
        round(graft.functions.Vec.cosine(col("a_f"), col("b_f")), 4))
      .orderBy(col("cos_sim").desc, col("a_id"), col("b_id"))
      .limit(10)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }
}
