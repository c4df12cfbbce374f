package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Vec

/** Exact (brute-force) vector-search operators over `embeddings.parquet`.
  *
  * These reproduce the reference's query surface without the IVF index:
  * J6/J7 + T2 in SURVEY.md §2 — squared-L2 distance, ascending, top-k,
  * ties broken by id (`/root/reference/src/ivf_index.rs:252-266`; the
  * reference's tie order is unstable-sort-undefined, so we pin ids).
  *
  * Scale notes: the query side is a one-row broadcast; Catalyst plans
  * `TakeOrderedAndProject` for orderBy+limit (per-partition top-k heap +
  * driver merge — no global sort/shuffle of the 100 TB scan). The batch
  * variant broadcasts the whole (small) query set and does one scan of
  * the big table for all queries — scan cost amortized across queries.
  */
object VectorQueries {

  /** Exact top-k NN of the embedding of `vec_id = qid`. */
  def knnExact(spark: SparkSession, dir: String, qid: Long, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.where(col("vec_id") === qid).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(q))
      .withColumn("distance", Vec.squaredL2(col("embedding"), col("qe")))
      .orderBy(col("distance"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("distance"))
  }

  private def knnExactSql(qid: Long, k: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $qid)
       |SELECT e.vec_id,
       |  list_reduce(list_transform(list_zip(e.embedding, q.qe),
       |    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |    (a, b) -> a + b) AS distance
       |FROM embeddings e CROSS JOIN q
       |ORDER BY distance, e.vec_id LIMIT $k""".stripMargin

  /** Batch exact kNN: every embedding with vec_id < nq is a query; top-k
    * per query via window rank — J7 in SURVEY.md §2.3.
    */
  def knnBatch(spark: SparkSession, dir: String, nq: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("distance"), col("vec_id"))
    emb.crossJoin(broadcast(queries))
      .withColumn("distance", Vec.squaredL2(col("embedding"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("distance"))
  }

  private def knnBatchSql(nq: Int, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < $nq),
       |d AS (
       |  SELECT q.query_id, e.vec_id,
       |    list_reduce(list_transform(list_zip(e.embedding, q.qe),
       |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
       |      (a, b) -> a + b) AS distance
       |  FROM embeddings e CROSS JOIN q),
       |r AS (SELECT query_id, vec_id, distance,
       |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rank
       |      FROM d)
       |SELECT query_id, rank, vec_id, distance FROM r WHERE rank <= $k""".stripMargin

  /** Top-k most similar pairs by cosine over a bounded id range — a
    * similarity self-join (small side broadcast).
    */
  def cosineTopPairs(spark: SparkSession, dir: String, nLeft: Int, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val left = emb.where(col("vec_id") < nLeft)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      .crossJoin(broadcast(left))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos_sim", Vec.cosine(col("a_emb"), col("b_emb")))
      .orderBy(col("cos_sim").desc, col("a_id"), col("b_id"))
      .limit(k)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
  }

  private def cosineTopPairsSql(nLeft: Int, k: Int): String =
    s"""WITH l AS (SELECT vec_id AS a_id, embedding AS a_emb FROM embeddings WHERE vec_id < $nLeft),
       |p AS (
       |  SELECT l.a_id, r.vec_id AS b_id,
       |    list_reduce(list_transform(list_zip(l.a_emb, r.embedding),
       |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b) AS dp,
       |    sqrt(list_reduce(list_transform(l.a_emb,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS na,
       |    sqrt(list_reduce(list_transform(r.embedding,
       |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nb
       |  FROM embeddings r CROSS JOIN l WHERE l.a_id < r.vec_id)
       |SELECT a_id, b_id,
       |  CASE WHEN na = 0 OR nb = 0 THEN 0.0 ELSE dp / (na * nb) END AS cos_sim
       |FROM p ORDER BY cos_sim DESC, a_id, b_id LIMIT $k""".stripMargin

  /** Distributed centroid update (A1): element-wise mean embedding per
    * true label, in exploded form so the DuckDB oracle checks it. The
    * array-native form of the same operator is the VecMean Aggregator
    * (compared against this in VecSpec).
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("val").cast("double")), 4).as("mean_val"))
      .orderBy(col("label"), col("pos"))

  private val labelCentroidsSql =
    """SELECT label, pos - 1 AS pos, round(avg(CAST(val AS DOUBLE)), 4) AS mean_val
      |FROM (SELECT label, unnest(embedding) AS val,
      |             generate_subscripts(embedding, 1) AS pos
      |      FROM embeddings)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** L2 normalization: unit-norm embeddings (cosine becomes dot after
    * this). Norm via the native DotProduct expression; element division
    * in double. Output exploded for oracle comparison.
    */
  def normalizedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") < 20)
      .withColumn("norm", sqrt(Vec.norm2Sq(col("embedding"))))
      .select(col("vec_id"),
        posexplode(
          when(col("norm") > 0,
            transform(col("embedding"), x => x.cast("double") / col("norm")))
            .otherwise(transform(col("embedding"), x => lit(0.0))))
          .as(Seq("pos", "val")))
      .select(col("vec_id"), col("pos"), round(col("val"), 6).as("val"))
      .orderBy(col("vec_id"), col("pos"))

  private val normalizedSampleSql =
    """WITH n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings WHERE vec_id < 20)
      |SELECT vec_id, pos - 1 AS pos,
      |  round(CASE WHEN nrm > 0 THEN CAST(val AS DOUBLE) / nrm ELSE 0.0 END, 6) AS val
      |FROM (SELECT vec_id, nrm, unnest(embedding) AS val,
      |             generate_subscripts(embedding, 1) AS pos
      |      FROM n)
      |ORDER BY vec_id, pos""".stripMargin

  def defs: Map[String, QueryDef] = Map(
    "vec_normalize" -> QueryDef(normalizedSample, Some(normalizedSampleSql)),
    "label_centroids" -> QueryDef(labelCentroids, Some(labelCentroidsSql)),
    "knn_exact" -> QueryDef(
      (s, d) => knnExact(s, d, qid = 0L, k = 10),
      Some(knnExactSql(0L, 10))),
    "knn_batch" -> QueryDef(
      (s, d) => knnBatch(s, d, nq = 8, k = 10),
      Some(knnBatchSql(8, 10))),
    "cosine_top_pairs" -> QueryDef(
      (s, d) => cosineTopPairs(s, d, nLeft = 16, k = 20),
      Some(cosineTopPairsSql(16, 20)))
  )
}
