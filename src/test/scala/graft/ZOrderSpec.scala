package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout gates: code correctness against a bit-twiddling
  * reference, and the actual mechanism — per-file (min, max) boxes that
  * a 2-D range predicate can skip — measured against a linear layout of
  * the same data.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("morton2 equals the reference interleave; orders locally") {
    val pairs = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton2(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b, 8), s"($a, $b)")
    }
    // the defining property: z is a bijection on the grid (no collisions)
    assert(got.values.toSet.size == pairs.size)
  }

  test("z-ordered layout: a 2-D box query can skip more files than a linear sort") {
    // synthetic 2-D uniform grid, large enough for 16 files to matter
    val df = (0 until 65536).map { i =>
      val a = (i * 2654435761L % 1024).toInt // pseudo-random but fixed
      val b = (i * 40503L % 1024).toInt
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    // 64 files so the margins survive repartitionByRange's sampled
    // (run-to-run varying) boundaries: linear must touch ~8 files for a
    // 1/8 a-range, the z-curve keeps the box within ~2
    ZOrder.writeClustered(df, "a", "b", zDir, numFiles = 64, bits = 10)
    df.repartitionByRange(64, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linDir)

    // files whose (min,max) box intersects the query box must be read;
    // the rest are skippable via footer stats
    def touched(dir: String, aLo: Int, aHi: Int, bLo: Int, bHi: Int): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b")))
          .head()
        val (minA, maxA, minB, maxB) =
          (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
        maxA >= aLo && minA <= aHi && maxB >= bLo && minB <= bHi
      }
    }
    // a box selecting ~1/8 of each dimension: linear prunes only on a
    // (≈ 64/8 = 8 files, each spanning all of b); the box's z-range is
    // 1/64 of the curve → ~1-2 z-ordered files even with boundary
    // straddle
    val zTouched = touched(zDir, 0, 127, 0, 127)
    val linTouched = touched(linDir, 0, 127, 0, 127)
    assert(zTouched < linTouched,
      s"z-order touches $zTouched files, linear touches $linTouched")
    assert(zTouched * 2 <= linTouched,
      s"weak win: z=$zTouched vs linear=$linTouched")
  }
}
