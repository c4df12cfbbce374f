package graft.sources

import java.io.{DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector dataset sources/sinks beyond parquet: the synthetic generator
  * (reference `generate_test_vectors_parallel`, `src/utils.rs:34-79`) and
  * the Faiss `.fvecs`/`.ivecs` formats the reference's bench loads
  * (`bench/faiss_bench_official/bench_all_ivf.py:88-143`).
  *
  * Scale shape: both Faiss formats are fixed-size-record files
  * (`[int32 dim][payload × dim]`), so a distributed read is pure offset
  * arithmetic — the file splits into record ranges, one partition per
  * range, each executor seeking directly to its slice. No single-reader
  * bottleneck, no shuffle. (Writes are driver-side: the formats are
  * single-file by definition; at scale you'd write parquet and convert
  * at the edge.)
  */
object VectorFormats {

  /** Deterministic synthetic vectors: n × dim uniform(-1, 1), derived
    * from xxhash64(id, component) so the output is identical for any
    * partitioning — unlike rand(), which seeds per partition. Replaces
    * the reference's rayon generator + bincode sink (S4); sink is
    * parquet.
    */
  def generate(spark: SparkSession, n: Long, dim: Int, seed: Long): DataFrame =
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${dim - 1}), i ->
             |  CAST((CAST(pmod(xxhash64(id, i, ${seed}L), 16777216) AS DOUBLE)
             |        / 8388608.0 - 1.0) AS FLOAT))""".stripMargin)
          .as("embedding"))

  // ------------------------------------------------------------- fvecs

  /** Distributed `.fvecs` read: `[int32 dim][float32 × dim]` repeated.
    * Record size is read from the first record; the file is split into
    * `parallelism` record-aligned ranges.
    */
  def readFvecs(spark: SparkSession, path: String,
      parallelism: Int = 32): DataFrame = {
    val (dim, nRecords) = fvecsShape(path, 4)
    val recBytes = 4L + 4L * dim
    import spark.implicits._
    val ranges = splitRanges(nRecords, parallelism)
    spark.sparkContext.parallelize(ranges, ranges.length)
      .flatMap { case (start, end) =>
        val raf = new RandomAccessFile(path, "r")
        try {
          val buf = new Array[Byte]((end - start) * recBytes match {
            case sz if sz > Int.MaxValue => throw new IllegalStateException("range too large")
            case sz => sz.toInt
          })
          raf.seek(start * recBytes)
          raf.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          (start until end).map { i =>
            val d = bb.getInt
            require(d == dim, s"record $i has dim $d, expected $dim")
            val v = new Array[Float](d)
            var j = 0
            while (j < d) { v(j) = bb.getFloat; j += 1 }
            (i, v.toSeq)
          }
        } finally raf.close()
      }
      .toDF("vec_id", "embedding")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  /** Driver-side `.fvecs` write (single-file format; test-scale only). */
  def writeFvecs(rows: Iterator[Array[Float]], path: String): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    try rows.foreach { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }

  // ------------------------------------------------------------- ivecs

  /** Distributed `.ivecs` read: `[int32 k][int32 × k]` repeated (the
    * ground-truth neighbor-id format).
    */
  def readIvecs(spark: SparkSession, path: String,
      parallelism: Int = 32): DataFrame = {
    val (k, nRecords) = fvecsShape(path, 4)
    val recBytes = 4L + 4L * k
    import spark.implicits._
    val ranges = splitRanges(nRecords, parallelism)
    spark.sparkContext.parallelize(ranges, ranges.length)
      .flatMap { case (start, end) =>
        val raf = new RandomAccessFile(path, "r")
        try {
          val buf = new Array[Byte](((end - start) * recBytes).toInt)
          raf.seek(start * recBytes)
          raf.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          (start until end).map { i =>
            val kk = bb.getInt
            require(kk == k, s"record $i has k $kk, expected $k")
            val v = new Array[Int](kk)
            var j = 0
            while (j < kk) { v(j) = bb.getInt; j += 1 }
            (i, v.toSeq)
          }
        } finally raf.close()
      }
      .toDF("query_id", "neighbor_ids")
      .select(col("query_id").cast("long").as("query_id"), col("neighbor_ids"))
  }

  /** Driver-side `.ivecs` write. */
  def writeIvecs(rows: Iterator[Array[Int]], path: String): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    try rows.foreach { v =>
      val bb = ByteBuffer.allocate(4 + 4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putInt)
      out.write(bb.array())
    } finally out.close()
  }

  // ----------------------------------------------------------- helpers

  /** (width, record count) of an fvecs/ivecs-shaped file. */
  private def fvecsShape(path: String, elemBytes: Int): (Int, Long) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      require(raf.length() >= 4, s"$path is not an fvecs/ivecs file")
      val head = new Array[Byte](4)
      raf.readFully(head)
      val dim = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dim > 0 && dim < 1000000, s"implausible record width $dim")
      val recBytes = 4L + elemBytes.toLong * dim
      require(raf.length() % recBytes == 0,
        s"file length ${raf.length()} not a multiple of record size $recBytes")
      (dim, raf.length() / recBytes)
    } finally raf.close()
  }

  private def splitRanges(n: Long, parts: Int): Seq[(Long, Long)] = {
    val per = math.max(1L, (n + parts - 1) / parts)
    (0L until n by per).map(s => (s, math.min(n, s + per)))
  }
}
