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
  def generate(spark: SparkSession, n: Long, dim: Int, seed: Long): DataFrame = {
    // sequence(0, dim-1) with dim = 0 would DESCEND ([0, -1]) and emit
    // 2-element garbage vectors instead of failing
    require(dim > 0, s"dim must be > 0: $dim")
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, ${dim - 1}), i ->
             |  CAST((CAST(pmod(xxhash64(id, i, ${seed}L), 16777216) AS DOUBLE)
             |        / 8388608.0 - 1.0) AS FLOAT))""".stripMargin)
          .as("embedding"))
  }

  /** Bump whenever [[generate]]'s output for a given (n, dim, seed)
    * changes — [[generatedPath]] keys its on-disk cache on this, so
    * recall gates and Debug harnesses can never silently keep testing
    * against vectors an older generator wrote.
    */
  val GeneratorVersion = 1

  /** Cached [[generate]]: writes the dataset under /tmp once and
    * revalidates via a marker file carrying (version, n, dim, seed) —
    * absent or mismatched marker regenerates. Returns the parquet path.
    */
  def generatedPath(spark: SparkSession, n: Long, dim: Int,
      seed: Long = 42L): String = {
    // seed is part of the directory key, not only the marker: two
    // harnesses alternating seeds at the same (n, dim) would otherwise
    // invalidate each other's marker and regenerate the full dataset on
    // every alternation — and a concurrent reader of the old seed's
    // data races the overwrite (r15 review)
    val dataDir = s"/tmp/graft_ref_scale_${n}_${dim}_s$seed"
    val vecPath = s"$dataDir/embeddings.parquet"
    val marker = java.nio.file.Paths.get(dataDir, "GENERATOR")
    val want = s"v$GeneratorVersion n=$n dim=$dim seed=$seed"
    val have =
      try new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
      catch { case _: java.io.IOException => "" }
    if (have != want || !new java.io.File(vecPath).exists()) {
      generate(spark, n, dim, seed).write.mode("overwrite").parquet(vecPath)
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, want.getBytes("UTF-8"))
    }
    vecPath
  }

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
    val ranges = splitRanges(nRecords, parallelism, recBytes)
    spark.sparkContext.parallelize(ranges, ranges.length)
      .flatMap { case (start, end) =>
        val raf = new RandomAccessFile(path, "r")
        try {
          val buf = new Array[Byte](((end - start) * recBytes).toInt)
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
    val ranges = splitRanges(nRecords, parallelism, recBytes)
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

  // --------------------------------------------------------------- npy

  /** Distributed `.npy` read of a float32 C-order (n, d) array — the
    * third bench input format (`bench_all_ivf.py:146-171`). Parses the
    * v1/v2 header on the driver, then splits rows into ranges exactly
    * like fvecs.
    */
  def readNpy(spark: SparkSession, path: String,
      parallelism: Int = 32): DataFrame = {
    val (dataOff, n, dim) = npyHeader(path)
    require(dim > 0, s"npy array has 0 columns: $path")
    import spark.implicits._
    if (n == 0) {
      return Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    }
    val rowBytes = 4L * dim
    val ranges = splitRanges(n, parallelism, rowBytes)
    spark.sparkContext.parallelize(ranges, ranges.length)
      .flatMap { case (start, end) =>
        val raf = new RandomAccessFile(path, "r")
        try {
          val buf = new Array[Byte](((end - start) * rowBytes).toInt)
          raf.seek(dataOff + start * rowBytes)
          raf.readFully(buf)
          val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
          (start until end).map { i =>
            val v = new Array[Float](dim)
            var j = 0
            while (j < dim) { v(j) = bb.getFloat; j += 1 }
            (i, v.toSeq)
          }
        } finally raf.close()
      }
      .toDF("vec_id", "embedding")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  /** Driver-side `.npy` v1 write of a float32 (n, d) array. */
  def writeNpy(rows: Iterator[Array[Float]], n: Long, dim: Int,
      path: String): Unit = {
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $dim), }"
    val headerLen = {
      val base = 10 + dict.length + 1 // magic(6)+ver(2)+len(2)+dict+\n
      val pad = (64 - base % 64) % 64
      dict.length + 1 + pad
    }
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      out.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      out.write(headerLen & 0xff)
      out.write((headerLen >> 8) & 0xff)
      val padded = dict + " " * (headerLen - dict.length - 1) + "\n"
      out.write(padded.getBytes("ASCII"))
      rows.foreach { v =>
        require(v.length == dim)
        val bb = ByteBuffer.allocate(4 * dim).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }

  /** (data offset, rows, cols) from an npy v1/v2 header. */
  private def npyHeader(path: String): (Long, Long, Int) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val magic = new Array[Byte](8)
      raf.readFully(magic)
      require(magic.take(6).sameElements(
        Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')), s"$path is not npy")
      val major = magic(6)
      val headerLen: Long =
        if (major == 1) {
          val b = new Array[Byte](2); raf.readFully(b)
          ((b(0) & 0xff) | ((b(1) & 0xff) << 8)).toLong
        } else {
          val b = new Array[Byte](4); raf.readFully(b)
          ((b(0) & 0xffL) | ((b(1) & 0xffL) << 8) |
            ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24))
        }
      val hdr = new Array[Byte](headerLen.toInt)
      raf.readFully(hdr)
      val s = new String(hdr, "ASCII")
      require(s.contains("'<f4'") || s.contains("\"<f4\""),
        s"only float32 npy supported, header: $s")
      require(s.contains("False"), "fortran_order npy not supported")
      val shape = "\\((\\s*\\d+\\s*,\\s*\\d+\\s*,?)\\)".r
        .findFirstMatchIn(s)
        .getOrElse(throw new IllegalArgumentException(s"no 2-d shape in: $s"))
        .group(1).split(",").map(_.trim).filter(_.nonEmpty)
      val dataOff = (if (major == 1) 10L else 12L) + headerLen
      (dataOff, shape(0).toLong, shape(1).toInt)
    } finally raf.close()
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

  /** Record ranges: at least `parts` ranges, and never more than
    * ~256 MiB per range — each range is buffered in one byte array, so
    * an unbounded range on a large file would overflow Int sizing.
    */
  private def splitRanges(n: Long, parts: Int, recBytes: Long): Seq[(Long, Long)] = {
    val maxRecsPerRange = math.max(1L, (256L << 20) / recBytes)
    val per = math.min(maxRecsPerRange, math.max(1L, (n + parts - 1) / parts))
    (0L until n by per).map(s => (s, math.min(n, s + per)))
  }
}
