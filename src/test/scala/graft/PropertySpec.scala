package graft

import scala.util.Random

import graft.operators.KMeans

/** Property-style invariants the reference suite lacks (SURVEY.md §5):
  * distance-metric laws, top-k prefix property, assignment optimality —
  * checked over many seeded random cases.
  */
class PropertySpec extends SparkSpec {

  def randVec(rng: Random, d: Int): Array[Float] =
    Array.fill(d)((rng.nextDouble() * 200 - 100).toFloat)

  test("distance: non-negative, symmetric, zero iff identical") {
    val rng = new Random(1L)
    (1 to 200).foreach { _ =>
      val d = 2 + rng.nextInt(31)
      val a = randVec(rng, d)
      val b = randVec(rng, d)
      val dab = KMeans.sqDist(a, b)
      assert(dab >= 0.0)
      assert(dab == KMeans.sqDist(b, a))
      assert(KMeans.sqDist(a, a) == 0.0)
    }
  }

  test("top-k is a prefix of top-(k+1)") {
    val data = Array.tabulate(200)(i =>
      Array.tabulate(8)(j => ((i * 31 + j * 7) % 97).toFloat))
    val rng = new Random(2L)
    (1 to 100).foreach { _ =>
      val q = randVec(rng, 8)
      val k = 1 + rng.nextInt(20)
      def topK(n: Int): Seq[Long] =
        data.zipWithIndex
          .map { case (v, i) => (i.toLong, KMeans.sqDist(q, v)) }
          .sortBy(p => (p._2, p._1)).take(n).map(_._1).toSeq
      assert(topK(k) == topK(k + 1).take(k))
    }
  }

  test("assignment optimality: nearest() beats any other centroid") {
    val rng = new Random(3L)
    (1 to 200).foreach { _ =>
      val k = 2 + rng.nextInt(9)
      val cs = Array.fill(k)(randVec(rng, 6))
      val p = randVec(rng, 6)
      val (bi, bd) = KMeans.nearest(p, cs)
      cs.indices.foreach(i => assert(KMeans.sqDist(p, cs(i)) >= bd))
      assert(KMeans.sqDist(p, cs(bi)) == bd)
    }
  }

  test("triangle-ish bound: sqrt(sqDist) satisfies triangle inequality") {
    val rng = new Random(4L)
    (1 to 200).foreach { _ =>
      val d = 2 + rng.nextInt(15)
      val a = randVec(rng, d)
      val b = randVec(rng, d)
      val c = randVec(rng, d)
      val ab = math.sqrt(KMeans.sqDist(a, b))
      val bc = math.sqrt(KMeans.sqDist(b, c))
      val ac = math.sqrt(KMeans.sqDist(a, c))
      assert(ac <= ab + bc + 1e-6)
    }
  }

  test("minhash: identical sets agree on all signatures, disjoint on ~none") {
    val a = (1 to 50).map(i => s"sh_$i").toSet
    def sig(s: Set[String]): Seq[Long] =
      (0 until 32).map(i => s.map(x => (x + ":" + i).hashCode.toLong).min)
    assert(sig(a) == sig(a))
    val disjoint = (100 to 150).map(i => s"sh_$i").toSet
    val agree = sig(a).zip(sig(disjoint)).count { case (x, y) => x == y }
    assert(agree <= 2)
  }
}
