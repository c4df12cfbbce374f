package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a many-small-files directory, preserving rows") {
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    // 64 tiny files, as an append-heavy ingest would leave behind
    (0 until 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "payload")
      .repartition(64).write.mode("overwrite").parquet(in)
    def files(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files(in).length == 64)
    val target = Compaction.dataBytes(spark, in) / 4
    val planned = Compaction.compact(spark, in, out, target)
    assert(planned <= 5, s"planned $planned files")
    assert(files(out).length == planned)
    // content identical
    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b)
    // inputs untouched (swap is the caller's job)
    assert(files(in).length == 64)
  }

  test("sortBy keeps the data clustered through the rewrite") {
    val in = Files.createTempDirectory("graft_compact_s_in").toString
    val out = Files.createTempDirectory("graft_compact_s_out").toString
    (0 until 20000).map(i => ((i * 2654435761L % 100000).toInt, i))
      .toDF("k", "v").repartition(32).write.mode("overwrite").parquet(in)
    Compaction.compact(spark, in, out,
      Compaction.dataBytes(spark, in) / 4, sortBy = Some("k"))
    // per-file key ranges must be (nearly) disjoint: total overlap-free
    // coverage means range pruning on k still works after compaction
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min(col("k")), max(col("k"))).head()
        (r.getInt(0), r.getInt(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(lo2 >= hi1, s"file ranges overlap: $hi1 vs $lo2")
      case _ => ()
    }
  }
}
