package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single edge forms one two-node cluster") {
    assert(cc(Seq((5L, 3L))) == Map(5L -> 3L, 3L -> 3L))
  }

  test("a chain collapses to the minimum id (worst-case diameter)") {
    // 9-8-7-...-1: label 1 must propagate the full diameter
    val chain = (1L until 9L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet == (1L to 9L).toSet)
    assert(got.values.forall(_ == 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((7L, 2L), (2L, 9L))) == cc(Seq((2L, 7L), (9L, 2L))))
  }

  test("distributed path errors on non-convergence instead of mislabeling") {
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.run(chain, "a", "b", maxIter = 1)
    }
  }

  test("star rounds collapse a deep chain fast (O(log^2), not O(diameter))") {
    // a 200-deep chain would need ~200 min-propagation rounds; the
    // large-star/small-star formulation must finish well under 15
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.run(chain, "a", "b", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (1L to 200L).toSet)
    assert(got.values.forall(_ == 1L))
  }

  test("local union-find path agrees with distributed propagation") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (20L, 21L), (5L, 1L), (12L, 10L))
    val df = edges.toDF("a", "b")
    val local = ConnectedComponents.resolve(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.run(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    // and resolve forced over the distributed path agrees too
    val forced = ConnectedComponents.resolve(df, "a", "b", localEdgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(forced == dist)
  }

  test("star algorithm matches union-find on a 5k-edge random graph") {
    // seeded pseudo-random graph: mixed cluster sizes, chains, isolated
    // pairs — the shapes hand-cases miss
    val rng = new scala.util.Random(42)
    val edges = Seq.fill(5000)((rng.nextInt(2000).toLong, rng.nextInt(2000).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("a", "b")
    val local = ConnectedComponents.resolve(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.run(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("dedup_clusters: canonical member is the cluster min, sizes consistent") {
    val out = graft.queries.DedupQueries.dedupClusters(spark, sf001).collect()
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid)
      assert(members.count(_.getBoolean(2)) == 1)
      assert(members.forall(_.getLong(3) == members.length))
      assert(members.length >= 2) // every clustered doc has a near-dup
    }
    // clusters must cover exactly the docs that appear in a verified pair
    val pairDocs = graft.queries.DedupQueries.minhashVerifiedPairs(spark, sf001)
      .select(explode(array(col("a_id"), col("b_id"))))
      .distinct().as[Long].collect().toSet
    assert(out.map(_.getLong(0)).toSet == pairDocs)
  }

  test("dedup_keep_best: survivor has the max distinct-token count per cluster") {
    val clusters = graft.queries.DedupQueries.dedupClusters(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> cluster
    val quality = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(array_distinct(graft.queries.TextQueries.tokens(col("text")))))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val best = graft.queries.DedupQueries.dedupKeepBest(spark, sf001).collect()
    assert(best.nonEmpty)
    // same cluster set as dedup_clusters
    assert(best.map(_.getLong(0)).toSet == clusters.values.toSet)
    best.foreach { r =>
      val (cid, size, keepId, keepQ, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = clusters.collect { case (d, c) if c == cid => d }.toSeq
      assert(members.size.toLong == size && dropped == size - 1)
      assert(members.contains(keepId))
      val maxQ = members.map(quality).max
      assert(keepQ == maxQ, s"cluster $cid kept q=$keepQ, max is $maxQ")
      // tie-break: lowest id among the max-quality members
      assert(keepId == members.filter(quality(_) == maxQ).min)
    }
  }
}
