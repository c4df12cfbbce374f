package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vec

/** LSH-bucketed approximate nearest neighbors for cosine similarity —
  * the second scale path beside IVF (random hyperplane LSH, Charikar
  * 2002): sign(dot(v, r_i)) over `nBits` seeded hyperplanes forms a
  * bucket signature; near-identical directions collide with high
  * probability. Candidates are bucket-local; per-query cost is the
  * bucket population, not the corpus.
  *
  * The hyperplanes are generated driver-side from a fixed seed and
  * inlined as literal arrays, so signatures are deterministic across
  * partitionings and sessions. Multi-probe: a query also probes the
  * `nProbeBits` buckets at Hamming distance 1 on its lowest-index bits,
  * trading a small scan increase for recall.
  */
object LshAnn {

  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Float]] = {
    val rng = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)((rng.nextGaussian()).toFloat))
  }

  /** Signature width for a corpus of `n` vectors: expected bucket
    * population ≈ `targetBucket`, i.e. nBits = ⌈log2(n / targetBucket)⌉,
    * clamped to [4, 24]. A FIXED bit width does not index at scale: with
    * b bits, a Hamming-1 multi-probe scans (b+1)/2^b of the corpus — a
    * constant fraction regardless of n. Growing b with n makes that
    * fraction shrink (4 bits → 31% at any size; 13 bits at n=1M →
    * 14/8192 ≈ 0.17%).
    */
  def suggestBits(n: Long, targetBucket: Long = 128L): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(4, raw))
  }

  /** Signature column: bit i set iff dot(emb, plane_i) >= 0. */
  def signature(emb: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(Vec.dot(emb, typedlit(p.toSeq)) >= 0.0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucketed table: (id, embedding, bucket). */
  def bucketed(df: DataFrame, idCol: String, embCol: String,
      planes: Array[Array[Float]]): DataFrame =
    df.select(col(idCol), col(embCol),
      signature(col(embCol), planes).as("bucket"))

  /** Driver-side query signature — the exact bit convention of the
    * executor-side [[signature]] column (double dot, `>= 0` sets the
    * bit). The ONE definition every driver-side prober (LSH search,
    * MaxSim candidates, the LSH oracle generator) must share: bucket
    * membership parity between the two sides is what candidate recall
    * rests on.
    */
  def querySignature(planes: Array[Array[Float]], query: Array[Float]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if (d >= 0.0) 1L << i else 0L
    }.reduce(_ | _)

  /** Multi-probe bucket set for one query: its own bucket plus the
    * `nProbeBits` Hamming-1 neighbors on the lowest-index bits.
    */
  def queryProbes(planes: Array[Array[Float]], query: Array[Float],
      nProbeBits: Int): Seq[Long] = {
    val qSig = querySignature(planes, query)
    (qSig +: (0 until math.min(nProbeBits, planes.length))
      .map(i => qSig ^ (1L << i))).distinct
  }

  /** Top-k by cosine for one query via bucket-local candidates. */
  def search(spark: SparkSession, table: DataFrame, idCol: String,
      embCol: String, planes: Array[Array[Float]],
      query: Array[Float], k: Int, nProbeBits: Int = 2): DataFrame = {
    require(planes.nonEmpty && query.length == planes(0).length,
      s"query dimension ${query.length} != hyperplane dimension " +
        s"${planes.headOption.map(_.length).getOrElse(0)}")
    // query signature + multi-probe neighbors, computed driver-side
    val probes = queryProbes(planes, query, nProbeBits)
    table
      .where(col("bucket").isin(probes: _*))
      .withColumn("cos_sim", Vec.cosine(col(embCol), typedlit(query.toSeq)))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cos_sim"))
  }
}
