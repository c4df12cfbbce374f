package graft

import org.apache.spark.sql.functions._
import graft.queries.DedupQueries

/** Stage-by-stage timing of the minhash_lsh_pairs pipeline. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val nHashes = 8
    val docs = (0 until nHashes).foldLeft(
      DedupQueries.shingledDocs(Tables.documents(spark, dir))) { (d, i) =>
      d.withColumn(s"sig_$i",
        array_min(transform(col("sh"), s =>
          DedupQueries.md5Long(concat(lit(s"$i:"), s)))))
    }.persist()
    t("signatures (persist+count)") { docs.count() }
    val banded = docs.select(col("doc_id"),
      posexplode(array((0 until nHashes / 2).map(b =>
        concat_ws("_", col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}"))): _*))
        .as(Seq("band_idx", "band_val")))
    val cand = banded.as("l")
      .join(banded.as("r"), Seq("band_idx", "band_val"))
      .where(col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val nCand = t("candidates") { cand.count() }
    println(s"candidates=$nCand")
    val verified = t("verify") {
      broadcast(cand)
        .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), "b_id")
        .withColumn("jaccard",
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
            size(array_union(col("a_sh"), col("b_sh"))))
        .where(col("jaccard") >= 0.7).count()
    }
    println(s"verified=$verified")
    def fold(base: org.apache.spark.sql.DataFrame) =
      (0 until nHashes).foldLeft(DedupQueries.shingledDocs(base)) { (d, i) =>
        d.withColumn(s"sig_$i",
          array_min(transform(col("sh"), s =>
            DedupQueries.md5Long(concat(lit(s"$i:"), s)))))
      }
    t("fold 1-part count") {
      fold(Tables.documents(spark, dir))
        .agg(sum(col("sig_0").cast("double"))).collect() }
    t("fold repart count") {
      fold(Tables.documents(spark, dir).repartition(col("doc_id")))
        .agg(sum(col("sig_0").cast("double"))).collect() }
    t("fold repart count 2") {
      fold(Tables.documents(spark, dir).repartition(col("doc_id")))
        .agg(sum(col("sig_1").cast("double"))).collect() }
    t("fold repart all-sig count") {
      fold(Tables.documents(spark, dir).repartition(col("doc_id")))
        .agg(sum((0 until nHashes).map(i => col(s"sig_$i").cast("double"))
          .reduce(_ + _))).collect() }
    t("write sans sh") {
      fold(Tables.documents(spark, dir).repartition(col("doc_id")))
        .drop("sh")
        .write.mode("overwrite").parquet("/tmp/graft_dbg_nosh") }
    t("write with sh") {
      fold(Tables.documents(spark, dir).repartition(col("doc_id")))
        .write.mode("overwrite").parquet("/tmp/graft_dbg_sh") }
    t("signedDocsPath write") { DedupQueries.signedDocsPath(spark, dir) }
    t("verifiedPairsPath write") { DedupQueries.verifiedPairsPath(spark, dir) }
    // NOTE: the signedDocsPath/verifiedPairsPath calls above populated
    // the JVM-wide parquet caches, so this is a WARM read of the pair
    // parquet — the cold end-to-end cost is their two timings combined
    t("full query end-to-end (warm caches)") {
      spark.catalog.clearCache()
      DedupQueries.minhashLshPairs(spark, dir).collect().length
    }
    spark.stop()
  }
}
