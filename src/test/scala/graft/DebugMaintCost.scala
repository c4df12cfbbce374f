package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ivf

/** Isolate the per-call cost of Ivf.maintenanceStats vs the located
  * recursive listing it replaced, at growing file counts — the
  * poll-from-ingest-loop claim (SCALE.md round 12).
  */
object DebugMaintCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_maintcost").toString
    val all = graft.sources.VectorFormats.generate(spark, 60000L, 16, 42L)
    val idx = Ivf.build(all.where(col("vec_id") < 20000L),
      "vec_id", "embedding", s"$root/index")
    val fs = new org.apache.hadoop.fs.Path(idx.vectorsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 10).foreach { b =>
      Ivf.append(idx, all.where(col("vec_id") >= 20000L + b * 4000L &&
        col("vec_id") < 20000L + (b + 1) * 4000L), "vec_id", "embedding")
      var t0 = System.nanoTime()
      val s = Ivf.maintenanceStats(spark, idx)
      val statsMs = (System.nanoTime() - t0) / 1e6
      // the LOCATED recursive listing maintenanceStats used before
      t0 = System.nanoTime()
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(idx.vectorsPath), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      val locatedMs = (System.nanoTime() - t0) / 1e6
      println(f"files=${s.dataFiles} stats=${statsMs}%.1f ms located=${locatedMs}%.1f ms")
    }
    spark.stop()
  }
}
