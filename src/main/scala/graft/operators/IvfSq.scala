package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** IVF-SQ8: the faiss `IndexIVFScalarQuantizer` architecture — IVF
  * partition pruning over an int8-quantized copy of the vectors
  * ([[Quantize]]'s symmetric per-vector scheme, 4×). The middle point of
  * the compression/recall tradeoff between IVF-Flat (1×, exact within
  * probed cells) and IVF-PQ (32×, codebook error): SQ8 keeps per-
  * dimension resolution, so recall at equal probe budget is near-flat
  * while the probed bytes shrink 4×.
  *
  * Same dataset contract as [[IvfPq]]: the coded sibling keeps the
  * `shard_id` directory layout and `centroid_id` row-group clustering of
  * the float dataset, so probe pruning works unchanged. Search is
  * asymmetric (float query vs dequantized rows) — dequantize + distance
  * are column expressions inside whole-stage codegen, no UDF anywhere.
  */
object IvfSq {

  /** Write the int8-coded sibling dataset of an IVF index. Reads the
    * LIVE view (tombstones filtered) so a rebuild never resurrects
    * deleted rows regardless of where in the delete lifecycle it runs.
    */
  def buildCodes(spark: SparkSession, ivf: Ivf.Index, outPath: String,
      idCol: String = null, embCol: String = "embedding"): Unit = {
    // null default resolves to the index's recorded id column — see
    // IvfPq.buildCodes (ADVICE r14)
    val id = Ivf.effectiveIdCol(ivf, idCol)
    val fs = new org.apache.hadoop.fs.Path(ivf.vectorsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // see IvfPq.buildCodes — capture-then-write keeps a racing delete
    // on the safe (stale-registration) side
    val fp = Ivf.tombstoneFp(fs, ivf)
    Ivf.writeVectors(
      Quantize.withInt8(Ivf.liveVectors(spark, ivf, id), embCol)
        .select(col("shard_id"), col("centroid_id"), col(id),
          col("q_scale"), col("q_emb")),
      id, ivf.numShards, outPath, "overwrite")
    Ivf.registerSibling(spark, ivf, outPath, fp)
  }

  /** Top-k over the int8-coded dataset: probe-pruned scan → dequantize →
    * squared-L2 → TakeOrderedAndProject.
    */
  def search(spark: SparkSession, ivf: Ivf.Index, codesPath: String,
      query: Array[Float], k0: Int, nProbe0: Int,
      idCol: String = null): DataFrame = {
    val id = Ivf.effectiveIdCol(ivf, idCol) // see buildCodes
    val k = math.min(k0, ivf.config.maxK)
    val nProbe = math.min(nProbe0, ivf.config.maxNProbe)
    require(k > 0, "k must be > 0")
    require(nProbe > 0, "n_probe must be > 0")
    require(query.length == ivf.centroids(0).length,
      s"query dimension ${query.length} != index dimension ${ivf.centroids(0).length}")
    val (probes, shards) = Ivf.probeSelection(ivf, query, nProbe)
    Ivf.liveRows(spark, ivf,
        Ivf.probePrunedScan(spark, codesPath, probes, shards, ivf.k),
        id)
      // fused dequantize+distance (SqCodesL2, codegen) — bitwise equal
      // to Vec.squaredL2(Quantize.dequantize(q_emb, q_scale), query)
      // but one compiled pass per candidate instead of an interpreted
      // HOF transform (QuantizeSpec parity gate; the D=768 cell
      // measured the HOF form at 5.9× the floor)
      .withColumn("distance",
        Quantize.codesL2(col("q_emb"), col("q_scale"), lit(query)))
      .orderBy(col("distance").asc_nulls_last, col(id))
      .limit(k)
      .select(col(id).as("external_id"), col("distance"))
  }
}
