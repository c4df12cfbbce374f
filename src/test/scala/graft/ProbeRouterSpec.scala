package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans

/** Probe-routing contracts for [[KMeans.ProbeRouter]] — the shared
  * routing function behind search/searchBatch/annJoin and the
  * probe-literal oracles. Pure driver-side, no Spark session.
  *
  * Two regimes: the DEFAULT router routes exactly (bounded-insertion
  * selection — k ≤ ApproxRoutingThreshold covers every current test and
  * bench scale), and an opt-in approximate router (approxThreshold
  * forced low) exercises the hierarchical O(√k + 16n) path for the
  * huge-k regime.
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
  // hierarchical path forced on (the k > ApproxRoutingThreshold regime)
  lazy val approx = new KMeans.ProbeRouter(cents, seed = 42L,
    approxThreshold = 100)

  def bruteTopN(q: Array[Float], n: Int): Seq[Int] =
    cents.indices
      .map(i => (i, KMeans.sqDist(q, cents(i))))
      .sortBy(t => (t._2, t._1))
      .take(n)
      .map(_._1)

  test("default router is EXACT at any n (bounded-insertion selection)") {
    for (q <- queries.take(10); n <- Seq(1, 5, 20, 64, bigK / 2, bigK)) {
      assert(router.topN(q, n).toSeq == bruteTopN(q, n), s"n=$n")
    }
    // and for small k too
    val small = new KMeans.ProbeRouter(cents.take(80), 42L)
    val q = queries(0)
    for (n <- Seq(1, 5, 80, 200)) {
      val exact = cents.take(80).indices
        .map(i => (i, KMeans.sqDist(q, cents(i))))
        .sortBy(t => (t._2, t._1)).take(n).map(_._1)
      assert(small.topN(q, n).toSeq == exact, s"small n=$n")
    }
  }

  test("approximate path: probe-all still exact even above the threshold") {
    val q = queries(1)
    assert(approx.topN(q, bigK).toSeq == bruteTopN(q, bigK))
    assert(approx.topN(q, 100000).toSeq == bruteTopN(q, bigK))
    // 2n >= k boundary also exact
    assert(approx.topN(q, bigK / 2).toSeq == bruteTopN(q, bigK / 2))
  }

  test("approximate path: n distinct valid probes, ascending distance") {
    val q = queries(2)
    val probes = approx.topN(q, 20)
    assert(probes.length == 20)
    assert(probes.distinct.length == 20)
    assert(probes.forall(c => c >= 0 && c < bigK))
    val ds = probes.map(c => KMeans.sqDist(q, cents(c))).toSeq
    assert(ds == ds.sorted, "probes must be ascending by distance")
  }

  test("approximate probes capture most of the exact top-n (16n pool)") {
    // uniform random centroids are the adversarial case for meta-cell
    // locality (the measured motivation for the 16n pool margin);
    // average probe capture over 50 queries at n=20 must clear a floor
    // well above what the old 2n pool delivered
    val n = 20
    val recalls = queries.map { q =>
      val got = approx.topN(q, n).toSet
      val exact = bruteTopN(q, n).toSet
      (got & exact).size.toDouble / n
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.7, s"avg probe capture@$n = $avg")
    // rank-1 probe (the assign cell) matches the exact nearest almost
    // always — it drives build/search cell agreement
    val top1 = queries.count(q => approx.topN(q, 1).head == bruteTopN(q, 1).head)
    assert(top1 >= 40, s"top-1 probe agreement $top1/50")
  }

  test("approximate routed work is O(√k + 16n): pool ≪ k") {
    val works = queries.map(q => approx.routedWork(q, 20))
    assert(works.max < bigK / 2,
      s"routed work ${works.max} not sub-linear in k=$bigK")
    assert(works.max <= 16 * 20 +
        (KMeans.DefaultMetaProbe + 3) * math.sqrt(bigK).toInt,
      s"routed work ${works.max} not O(m√k + 16n)")
    // the default exact router reports k distances
    assert(router.routedWork(queries(0), 20) == bigK)
  }

  test("deterministic across instances (driver/executor parity)") {
    val other = new KMeans.ProbeRouter(cents, seed = 42L, approxThreshold = 100)
    for (q <- queries.take(10); n <- Seq(1, 7, 20)) {
      assert(approx.topN(q, n).toSeq == other.topN(q, n).toSeq)
    }
  }

  test("n <= 0 or empty yields empty") {
    assert(router.topN(queries(0), 0).isEmpty)
    assert(approx.topN(queries(0), 0).isEmpty)
  }
}
