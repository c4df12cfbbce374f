package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the scheme behind faiss
  * IVF-PQ): split a d-dim vector into `m` subvectors, vector-quantize
  * each against a per-subspace codebook of `ksub` centroids, store only
  * the m byte codes. A 64-float embedding (256 B) becomes 8 code bytes —
  * 32× — which at 100 TB of embeddings is what makes the candidate scan
  * memory-resident.
  *
  * Search uses asymmetric distance computation (ADC): the query stays
  * un-quantized; a per-query lookup table lut[j][c] =
  * ‖query_sub_j − codebook[j][c]‖² is computed once (m·ksub·dsub mults,
  * driver-side) and embedded as a literal column, so the scan itself is a
  * pure higher-order-function fold — whole-stage codegen, no UDF, no
  * shuffle, and the per-row cost is m table lookups instead of d mults.
  *
  * Codebook training runs per-subspace k-means on the driver over the
  * same bounded deterministic sample `KMeans.fit` uses (collected ONCE,
  * sliced m ways); encoding is a one-time map-side UDF over broadcast
  * codebooks at index-build time — the query path never runs a UDF.
  */
object Pq {

  final case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks.head.length
    def dsub: Int = codebooks.head.head.length
    def dim: Int = m * dsub
  }

  /** Train per-subspace codebooks. `ksub` ≤ 256 (codes are stored as
    * offset-128 tinyint — the full 8-bit PQ code range).
    */
  def train(df: DataFrame, embCol: String, dim: Int, m: Int = 8,
      ksub: Int = 16, iters: Int = 10, seed: Long = 42L,
      orderCol: Option[String] = None): Model = {
    require(m > 0 && dim % m == 0, s"dim=$dim not divisible by m=$m")
    require(ksub >= 2 && ksub <= 256, s"ksub=$ksub out of [2,256]")
    val dsub = dim / m
    // one deterministic pool collect (same mechanism as KMeans.fit),
    // sliced per subspace — not m separate collects
    // null/ragged rows are excluded from the TRAINING pool (encode
    // null-codes them downstream — the shared degraded-row contract);
    // the cut mirrors KMeans.fit exactly: hash-ordered, so it is
    // deterministic across partitionings and unbiased in table order
    val clean = df.where(col(embCol).isNotNull && size(col(embCol)) === dim)
    val pool: Array[Array[Float]] = orderCol match {
      case Some(c) =>
        // bounded-driver cut (KMeans.hashOrderedPool): bitwise the same
        // top-InitSampleCap rows, without TakeOrdered shipping every
        // partition's local top-K of the full table to the driver
        KMeans.hashOrderedPool(clean.select(col(c), col(embCol)),
          c, embCol, KMeans.InitSampleCap, seed, knownCount = None)
      case None =>
        // same content-hash threshold cut as KMeans.fit's default path:
        // the previous df.sample pre-cut seeded its RNG per partition,
        // so the pool — hence the codebooks and every downstream code —
        // silently depended on the table's partitioning while the
        // docstring above claimed determinism (r15 review)
        KMeans.hashOrderedPool(clean.select(col(embCol)),
          embCol, embCol, KMeans.InitSampleCap, seed, knownCount = None)
    }
    require(pool.nonEmpty, "PQ train: empty input")
    val codebooks = Array.tabulate(m) { j =>
      val sub = pool.map(_.slice(j * dsub, (j + 1) * dsub))
      // distinct per-subspace seed, same ·31+7 derivation family as Ivf
      KMeans.trainDriver(sub, math.min(ksub, sub.length), iters,
        seed * 31 + 7 * (j + 1)).centroids
    }
    Model(codebooks)
  }

  /** Encode: adds `codeCol` = array<tinyint> of length m (code c stored
    * as c−128). One-time build-side UDF over broadcast codebooks.
    */
  def encode(df: DataFrame, embCol: String, model: Model,
      codeCol: String = "pq_code"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model.codebooks)
    // Seq[Byte], not Array[Byte] — Array[Byte] maps to BinaryType and
    // the ADC zip_with needs array<tinyint>. A null/ragged embedding
    // encodes to null, which ADC propagates and search sorts nulls-last
    // (the same degraded-row contract as Ivf.search).
    val dim = model.dim
    val enc = udf { (emb: Seq[Float]) =>
      // non-finite elements also null-code: every subspace distance is
      // NaN, so nearest() would fall through to centroid 0 and the row
      // would compete in ADC top-k behind a bogus FINITE distance —
      // whereas the float path's NaN distance ranks last. Null codes
      // restore the same ranks-last behavior on both paths.
      if (emb == null || emb.length != dim ||
          emb.exists(f => f.isNaN || f.isInfinite)) null
      else {
        val v = emb.toArray
        val books = bc.value
        val dsub = books.head.head.length
        Seq.tabulate(books.length) { j =>
          val sub = v.slice(j * dsub, (j + 1) * dsub)
          (KMeans.nearest(sub, books(j))._1 - 128).toByte
        }
      }
    }
    df.withColumn(codeCol, enc(col(embCol)))
  }

  /** Per-query ADC lookup table as plain data:
    * lut[j][c] = ‖query_sub_j − codebook[j][c]‖². Used as a literal
    * column by [[lutFor]] and as a DataFrame column by the residual
    * IVF-PQ paths (where the LUT varies per probed centroid).
    */
  def lutSeq(query: Array[Float], model: Model): Seq[Seq[Double]] = {
    require(query.length == model.dim,
      s"query dim ${query.length} != model dim ${model.dim}")
    val dsub = model.dsub
    model.codebooks.zipWithIndex.map { case (book, j) =>
      val sub = query.slice(j * dsub, (j + 1) * dsub)
      book.map(c => KMeans.sqDist(sub, c)).toSeq
    }.toSeq
  }

  /** [[lutSeq]] embedded as a literal array<array<double>> column —
    * ONE Literal node holding the nested array value (typedlit), not
    * an `array(array(lit...))` tree of m×256 Literal children: the
    * value reaching zip_with/element_at is identical, but Catalyst
    * walks the expression tree many times per analysis/optimization
    * pass and the 2k-node spelling cost ~0.2 s of planning per query
    * per pass (r18 measurement across the ann_* family).
    */
  def lutFor(query: Array[Float], model: Model): Column =
    typedlit(lutSeq(query, model))

  /** ADC distance of a code column against a per-query LUT literal —
    * a zip_with + fold, fully codegen'd.
    */
  def adc(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut,
        (c, subLut) => element_at(subLut, c.cast("int") + 129)),
      lit(0.0), (acc, x) => acc + x)

  /** Top-k by ADC distance over an encoded table. */
  def search(encoded: DataFrame, idCol: String, codeCol: String,
      model: Model, query: Array[Float], k: Int): DataFrame =
    encoded
      .withColumn("distance", adc(col(codeCol), lutFor(query, model)))
      .orderBy(col("distance").asc_nulls_last, col(idCol))
      .limit(k)
      .select(col(idCol), col("distance"))

  /** Decode codes back to the reconstructed vector (test/debug). */
  def decode(code: Array[Byte], model: Model): Array[Float] = {
    val out = new Array[Float](model.dim)
    var j = 0
    while (j < model.m) {
      val c = model.codebooks(j)(code(j) + 128)
      System.arraycopy(c, 0, out, j * model.dsub, model.dsub)
      j += 1
    }
    out
  }
}
