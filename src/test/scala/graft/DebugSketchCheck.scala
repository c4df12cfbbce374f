package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev harness: dump ONLY the named catalog queries (default: the two
  * sketch queries) + their oracle SQL to a scratch dir, for a fast
  * `tools/check_oracle.py <sf> <out> --skip-verify <names>` loop without
  * paying the full catalog Verify run.
  */
object DebugSketchCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/sketch_check"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("approx_distinct_parts", "approx_quantiles")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val all = graft.queries.Catalog.all
    names.foreach { n =>
      all(n).build(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$n")
    }
    graft.queries.OracleGen.enable(spark, sfDir)
    // re-read the catalog AFTER enabling generation (Catalog.all is a
    // def; the `all` above was captured with ctx unset, so generated
    // oracles in it are frozen to None — only literal SQL survives)
    val withOracles = graft.queries.Catalog.all
    val q = Verify.jsonEscape _
    val json = names
      .flatMap(n => withOracles(n).oracle.map(sql => s"${q(n)}: ${q(sql)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
