package graft

import java.nio.file.Files

/** Sample program: Faiss-style (D, I) matrix API. */
object DebugMatrix {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = VectorIndexer.Config(dimension = 64,
      indexDir = Files.createTempDirectory("graft_dm").toString)
    val vi = VectorIndexer.create(spark, cfg)
      .build(Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val qs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where("vec_id < 3").orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    val (d, i) = vi.searchMatrix(qs, k = 5)
    qs.indices.foreach { q =>
      println(s"DBG I[$q]=${i(q).mkString(",")} D[$q]=${d(q).map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
