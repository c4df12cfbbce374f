package graft

import org.apache.spark.sql.functions._

/** Empty-input edge gates for the public operators: every degenerate
  * shape (empty corpus, empty query batch, empty candidate/pair set)
  * must degrade to an EMPTY result — no NaN scores, no
  * division-by-zero, no crash. A production pipeline hits these on
  * day one (a new shard with no documents yet, a query batch filtered
  * to nothing), and a NaN that survives into a ranking silently
  * corrupts downstream top-k.
  */
class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base =
    java.nio.file.Files.createTempDirectory("graft_edge").toString
  private lazy val emptyCorpus =
    Seq.empty[(Long, Seq[String])].toDF("doc_id", "terms")
  private lazy val tinyCorpus =
    Seq((1L, Seq("a", "b")), (2L, Seq("b", "c"))).toDF("doc_id", "terms")

  test("bm25: empty corpus builds an empty index; scoring returns empty") {
    val idx = graft.operators.Bm25.build(emptyCorpus, s"$base/bm25e")
    val rows = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scoredFromPairs(spark, idx, Array((1L, "a"))),
      k = 5).collect()
    assert(rows.isEmpty)
  }

  test("bm25: empty query batch scores to empty, not a full scan result") {
    val idx = graft.operators.Bm25.build(tinyCorpus, s"$base/bm25t")
    val rows = graft.operators.Bm25.topDocs(
      graft.operators.Bm25.scoredFromPairs(spark, idx,
        Array.empty[(Long, String)]), k = 5).collect()
    assert(rows.isEmpty)
  }

  test("minhash: empty frame yields no pairs; empty pair set no clusters") {
    assert(graft.operators.MinHashLsh.verifiedPairs(
      emptyCorpus, "doc_id", "terms").collect().isEmpty)
    assert(graft.operators.MinHashLsh.clusters(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).collect().isEmpty)
  }

  test("cross-encoder: empty candidate pair set re-ranks to empty") {
    assert(graft.operators.CrossEncoder.rerank(spark,
      tinyCorpus.select(col("doc_id").as("query_id"), col("terms")),
      tinyCorpus, Array.empty[(Long, Long)], k = 5).collect().isEmpty)
  }

  test("hll: empty input sketches to empty registers and empty estimate") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val regs = graft.operators.Hll.sketch(empty, "k", col("v"))
    assert(regs.collect().isEmpty)
    assert(graft.operators.Hll.estimate(regs, "k", "d").collect().isEmpty)
  }

  test("quantile sketch: empty input yields empty buckets and quantiles") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    val sk = graft.operators.QuantileSketch.sketch(empty, "k", col("v"))
    assert(sk.collect().isEmpty)
    assert(graft.operators.QuantileSketch.quantiles(
      sk, "k", 2.0, Seq("p50" -> 0.5)).collect().isEmpty)
  }

  test("cms heavyHitters: empty input yields empty, not a null-total crash") {
    val empty = Seq.empty[String].toDF("k")
    assert(graft.operators.CountMin
      .heavyHitters(empty, "k", 200L, 4, 64).collect().isEmpty)
  }

  test("hll pairwiseOverlap: empty input and single key both yield no pairs") {
    val empty = Seq.empty[(String, Long)].toDF("k", "v")
    assert(graft.operators.Hll
      .pairwiseOverlap(empty, "k", col("v")).collect().isEmpty)
    val single = Seq(("a", 1L), ("a", 2L)).toDF("k", "v")
    assert(graft.operators.Hll
      .pairwiseOverlap(single, "k", col("v")).collect().isEmpty)
  }

  test("connected components: both paths agree on self-loops and null ids") {
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), Some(3L)),
      (None, Some(4L)), (Some(5L), Some(6L)))
      .toDF("a", "b")
    def labels(cap: Long) = graft.operators.ConnectedComponents
      .resolve(edges, "a", "b", localEdgeCap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val local = labels(1000000L) // driver union-find path
    val dist = labels(0L)        // forced distributed star path
    assert(local == dist, s"paths diverge: $local vs $dist")
    assert(local == Set(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L),
      s"self-loop/null edges must drop cleanly: $local")
  }

  test("bpe: non-BMP words keep surrogate pairs whole") {
    val word = "a😀b" // a😀b
    val syms = graft.operators.Bpe.encodeWord(word, Seq.empty)
    assert(syms == Seq("a", "😀", "b"),
      s"code points must not split into lone surrogates: $syms")
  }

  test("classifier: a null token ELEMENT scores cleanly, not an NPE") {
    val docs = Seq((1L, Seq("good", null, "doc"))).toDF("doc_id", "toks")
    val model = graft.operators.LinearClassifier.Model(
      Array.fill(64)(0.1), 0.0)
    val p = docs.select(graft.operators.LinearClassifier
      .scoreCol(docs, col("toks"), model).as("p")).head().getDouble(0)
    assert(p > 0.0 && p < 1.0)
  }

  test("rrf: fusing empty arms yields empty") {
    assert(graft.operators.Rrf.fuse(Seq(
      Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rk"),
      Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rk")))
      .collect().isEmpty)
  }
}
