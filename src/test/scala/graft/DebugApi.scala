package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Sample user program through the public API (verification drive). */
object DebugApi {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = VectorIndexer.Config(dimension = 64,
      indexDir = Files.createTempDirectory("graft_demo").toString)
    val vi = VectorIndexer.create(spark, cfg)
      .build(Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val q = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where("vec_id = 7").select("embedding").head().getSeq[Float](0).toArray

    println("DBG single search (defaults k=10 nProbe=20):")
    vi.search(q).collect().take(3).foreach(r => println(s"DBG   $r"))
    println("DBG reload + search identical: " + {
      val again = VectorIndexer.load(spark, cfg).search(q).collect().toSeq
      again == vi.search(q).collect().toSeq
    })
    println("DBG batch search rows: " +
      vi.searchBatch(Array((7L, q)), k = 5).collect().mkString(" | "))
    println("DBG suggestNlist(1M) = " + VectorIndexer.suggestNlist(1000000))
    spark.stop()
  }
}
