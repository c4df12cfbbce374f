package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans

/** Probe-routing contracts for [[KMeans.ProbeRouter]] — the shared
  * routing function behind search/searchBatch/annJoin and the
  * probe-literal oracles. Pure driver-side, no Spark session.
  */
class ProbeRouterSpec extends AnyFunSuite {

  val dim = 8
  val bigK = 2500
  val rnd = new Random(7)
  val cents: Array[Array[Float]] =
    Array.fill(bigK)(Array.fill(dim)(rnd.nextFloat()))
  val queries: Array[Array[Float]] =
    Array.fill(50)(Array.fill(dim)(rnd.nextFloat()))
  lazy val router = new KMeans.ProbeRouter(cents, seed = 42L)

  def bruteTopN(q: Array[Float], n: Int): Seq[Int] =
    cents.indices
      .map(i => (i, KMeans.sqDist(q, cents(i))))
      .sortBy(t => (t._2, t._1))
      .take(n)
      .map(_._1)

  test("small k routes exactly (brute path)") {
    val small = new KMeans.ProbeRouter(cents.take(80), 42L)
    val q = queries(0)
    for (n <- Seq(1, 5, 80, 200)) {
      val exact = cents.take(80).indices
        .map(i => (i, KMeans.sqDist(q, cents(i))))
        .sortBy(t => (t._2, t._1)).take(n).map(_._1)
      assert(small.topN(q, n).toSeq == exact, s"n=$n")
    }
  }

  test("probe-all is exact even at large k") {
    val q = queries(1)
    assert(router.topN(q, bigK).toSeq == bruteTopN(q, bigK))
    assert(router.topN(q, 100000).toSeq == bruteTopN(q, bigK))
    // 2n >= k boundary also brute
    assert(router.topN(q, bigK / 2).toSeq == bruteTopN(q, bigK / 2))
  }

  test("hierarchical path: n distinct valid probes, ascending distance") {
    val q = queries(2)
    val probes = router.topN(q, 20)
    assert(probes.length == 20)
    assert(probes.distinct.length == 20)
    assert(probes.forall(c => c >= 0 && c < bigK))
    val ds = probes.map(c => KMeans.sqDist(q, cents(c))).toSeq
    assert(ds == ds.sorted, "probes must be ascending by distance")
  }

  test("hierarchical probes recall vs exact top-n stays high") {
    // uniform random centroids are the hard case (no cluster structure);
    // average probe recall over 50 queries at n=20 must clear a
    // conservative floor — the engine-level gate for the approximation
    val n = 20
    val recalls = queries.map { q =>
      val got = router.topN(q, n).toSet
      val exact = bruteTopN(q, n).toSet
      (got & exact).size.toDouble / n
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.5, s"avg probe recall@$n = $avg")
    // rank-1 probe (the assign cell) matches the exact nearest centroid
    // almost always — it drives build/search cell agreement
    val top1 = queries.count(q => router.topN(q, 1).head == bruteTopN(q, 1).head)
    assert(top1 >= 40, s"top-1 probe agreement $top1/50")
  }

  test("routed work is O(√k): pool ≪ k on the hierarchical path") {
    // k=2500 → metaK=50, avg cell 50; n=20 needs a ≥40-candidate pool →
    // a few cells. The contract: distances computed per routed query are
    // a small multiple of √k, nowhere near the O(k) brute scan.
    val works = queries.map(q => router.routedWork(q, 20))
    assert(works.max < bigK / 4,
      s"routed work ${works.max} not sub-linear in k=$bigK")
    assert(works.max <= 20 * math.sqrt(bigK).toInt,
      s"routed work ${works.max} not O(√k)")
  }

  test("deterministic across instances (driver/executor parity)") {
    val other = new KMeans.ProbeRouter(cents, seed = 42L)
    for (q <- queries.take(10); n <- Seq(1, 7, 20)) {
      assert(router.topN(q, n).toSeq == other.topN(q, n).toSeq)
    }
  }

  test("n <= 0 or empty yields empty") {
    assert(router.topN(queries(0), 0).isEmpty)
  }
}
