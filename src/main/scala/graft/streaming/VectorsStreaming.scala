package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ivf

/** Streaming vector search: a stream of query embeddings answered
  * against a STATIC IVF index — the production shape for continuously
  * checking an incoming crawl against a fixed corpus (retrieval,
  * online near-dup screening) without re-planning per query.
  *
  * Implementation is `foreachBatch` + [[Ivf.annJoin]]: each micro-batch
  * is an ordinary DataFrame, so the same distributed ANN join the batch
  * path uses (map-side centroid routing → shuffle join on centroid_id →
  * per-query top-k window) runs unchanged. Per-query results depend
  * only on that query's row, so micro-batch boundaries cannot change
  * any answer: the union over batches IS the batch answer
  * (StreamingSpec asserts this by splitting the same input three ways).
  *
  * State: none. The streaming side carries no aggregation state at all;
  * the index is static files + a broadcast routing table. At 100 TB the
  * per-trigger cost is exactly the batch annJoin cost of that trigger's
  * rows.
  */
object VectorsStreaming {

  /** Streaming read of the embeddings parquet (stand-in for a Kafka
    * query feed).
    */
  def readQueries(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
  }

  /** Run a query stream to completion against the index, materializing
    * every micro-batch's annJoin output under `outPath`.
    *
    * Write semantics are AT-LEAST-ONCE: `foreachBatch` appends parquet
    * with no checkpoint, so a retried micro-batch would append its
    * results twice. Callers needing exactly-once should pass a
    * `checkpointLocation` through the query options and make the batch
    * write idempotent (e.g. `partitionBy(batch_id)` + dynamic overwrite
    * per batch).
    */
  def annSearchToPath(queries: DataFrame, index: Ivf.Index, k: Int,
      nProbe: Int, outPath: String): Unit = {
    val q = queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ivf.annJoin(batch, index, k = k, nProbe = nProbe)
          .write.mode("append").parquet(outPath)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Catalog query: the same 20-query workload as `ann_join_topk`, fed
    * through the stream path with probe-all (exact ⇒ shares the batch
    * oracle). Output goes to a fixed per-(JVM, dir) cache path (the
    * same convention as the index/pairs caches) wiped before each run —
    * not a fresh temp dir per invocation, which would leak a directory
    * per call.
    */
  def annSearchQuery(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.queries.IndexQueries.index(spark, dir)
    val out = s"/tmp/graft_stream_ann/${graft.Tables.cacheDirName(dir)}"
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true) // stale results from a prior run must not append-merge
    val queries = readQueries(spark, dir)
      .where(col("vec_id") >= 480 && col("vec_id") < 500)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    annSearchToPath(queries, idx, k = 3, nProbe = 10000, out)
    spark.read.parquet(out).orderBy(col("query_id"), col("rank"))
  }
}
