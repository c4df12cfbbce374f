package graft

import java.nio.file.Files

/** Mirrors `/root/reference/tests/api_tests.rs`: config defaults, build +
  * load + search roundtrip, clamping, include_vectors, error cases.
  */
class ApiSpec extends SparkSpec {

  def freshCfg(dim: Int = 4): VectorIndexer.Config =
    VectorIndexer.Config(dimension = dim,
      indexDir = Files.createTempDirectory("graft_api").toString)

  def ramp(n: Int, dim: Int): Seq[(Long, Array[Float], Long)] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * dim + j) * 0.1f) % 50.0f), i.toLong)
    }

  test("config defaults mirror the reference") {
    val c = freshCfg()
    assert(c.defaultK == 10 && c.defaultNProbe == 20 &&
      c.maxK == 10000 && c.maxNProbe == 10000)
  }

  test("build + search roundtrip: query vector returns itself first") {
    val vi = VectorIndexer.create(spark, freshCfg()).buildFromRecords(ramp(200, 4))
    val q = ramp(200, 4)(17)._2
    val rows = vi.search(q).collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 17L)
    assert(rows.head.getDouble(1) < 0.1)
  }

  test("load roundtrip searches identically") {
    val cfg = freshCfg()
    val vi = VectorIndexer.create(spark, cfg).buildFromRecords(ramp(150, 4))
    val q = ramp(150, 4)(3)._2
    val a = vi.search(q).collect().map(_.toSeq).toSeq
    val b = VectorIndexer.load(spark, cfg).search(q).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("defaults honored; overrides honored; clamping applied") {
    val vi = VectorIndexer.create(spark, freshCfg()).buildFromRecords(ramp(100, 4))
    val q = ramp(100, 4)(0)._2
    assert(vi.search(q).collect().length == 10) // default k
    assert(vi.search(q, k = 3).collect().length == 3)
    // k beyond maxK clamps rather than erroring
    assert(vi.search(q, k = 1000000, nProbe = 1000000).collect().length == 100)
  }

  test("include_vectors controls the payload column") {
    val vi = VectorIndexer.create(spark, freshCfg()).buildFromRecords(ramp(50, 4))
    val q = ramp(50, 4)(0)._2
    assert(!vi.search(q).columns.contains("vector"))
    val withVec = vi.search(q, includeVectors = true)
    assert(withVec.columns.contains("vector"))
    assert(withVec.collect().head.getSeq[Float](2).toArray.toSeq == q.toSeq)
  }

  test("error cases: empty build, dim mismatch, unbuilt search, k=0") {
    val cfg = freshCfg()
    val vi = VectorIndexer.create(spark, cfg)
    intercept[IllegalArgumentException](vi.buildFromRecords(Seq.empty))
    intercept[IllegalArgumentException](
      vi.buildFromRecords(Seq((1L, Array(1f, 2f), 0L)))) // dim 2 != 4
    intercept[IllegalStateException](vi.search(Array(0f, 0f, 0f, 0f)))
    vi.buildFromRecords(ramp(50, 4))
    intercept[IllegalArgumentException](vi.search(ramp(50, 4)(0)._2, k = 0))
    intercept[IllegalArgumentException](vi.search(ramp(50, 4)(0)._2, nProbe = 0))
    intercept[IllegalArgumentException](vi.search(Array(1f, 2f))) // query dim
  }

  test("searchMatrix pads with inf/-1 like the reference bindings") {
    val vi = VectorIndexer.create(spark, freshCfg()).buildFromRecords(ramp(5, 4))
    val (d, i) = vi.searchMatrix(Array(ramp(5, 4)(0)._2), k = 10, nProbe = 10000)
    assert(d.length == 1 && d(0).length == 10)
    assert(i(0).take(5).forall(_ >= 0))       // 5 real results
    assert(i(0).drop(5).forall(_ == -1L))     // padded ids
    assert(d(0).drop(5).forall(_.isPosInfinity)) // padded distances
    assert(i(0)(0) == 0L && d(0)(0) == 0.0)
  }

  test("suggest_nlist parity") {
    assert(VectorIndexer.suggestNlist(5000) == math.sqrt(5000).toInt)
    assert(VectorIndexer.suggestNlist(1000000) == 4000)
  }

  test("missing-index load fails") {
    intercept[Exception](VectorIndexer.load(spark, freshCfg()))
  }
}
