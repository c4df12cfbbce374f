package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin
import graft.queries.TextQueries.tokens

/** Count-Min sketch invariants: the one-sided error guarantee, exact
  * incremental mergeability, bounded size, and partitioning
  * independence of the estimates.
  */
class CountMinSpec extends SparkSpec {

  private val depth = 4
  private val width = 1024

  private lazy val toks = Tables.documents(spark, sf001)
    .select(col("doc_id"), explode(tokens(col("text"))).as("token"))

  test("estimate >= exact count for EVERY token (one-sided error)") {
    val sketch = CountMin.build(toks, "token", depth, width)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_c"))
    val est = CountMin.estimate(sketch, exact, "token", depth, width)
    val bad = est.where(col("cms_c") < col("exact_c")).count()
    assert(bad == 0, s"$bad tokens under-estimated — CMS guarantee broken")
    // and the overestimate is small at this (depth, width) for this vocab
    val worst = est.select(max(col("cms_c") - col("exact_c"))).head().getLong(0)
    assert(worst <= 50, s"worst overestimate $worst too large for 1024 cells")
  }

  test("sketch of the union == cell-wise merge of split sketches") {
    val a = toks.where(col("doc_id") < 250)
    val b = toks.where(col("doc_id") >= 250)
    val merged = CountMin.merge(
      CountMin.build(a, "token", depth, width),
      CountMin.build(b, "token", depth, width))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.build(toks, "token", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "merge is not exactly the union sketch")
  }

  test("a never-seen key estimates 0, not an inflated occupied-cell min") {
    import spark.implicits._
    val sketch = CountMin.build(toks, "token", depth, width)
    val unseen = Seq("zzz_not_in_any_document_zzz").toDF("token")
    val est = CountMin.estimate(sketch, unseen, "token", depth, width).collect()
    assert(est.length == 1, "unseen key must not vanish from the output")
    // with 1024 cells and a small vocab, at least one of the 4 cells is
    // empty → the min must include the implicit 0
    assert(est.head.getLong(1) == 0L,
      s"unseen key estimated ${est.head.getLong(1)}")
  }

  test("sketch size is bounded by depth x width regardless of input size") {
    val n = CountMin.build(toks, "token", depth, width).count()
    assert(n <= depth.toLong * width,
      s"sketch has $n rows > ${depth * width}")
  }

  test("estimateOccurrences matches the keyed estimate for every occurrence") {
    val sketch = CountMin.build(toks, "token", depth, width)
    val perOcc = CountMin
      .estimateOccurrences(toks, "token", sketch, depth, width)
      .dropDuplicates("token")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keyed = CountMin.estimate(sketch,
        toks.select(col("token")).distinct(), "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perOcc == keyed,
      "the map-side per-occurrence estimate must equal estimate()")
  }

  test("one-sided guarantee survives forced collisions (width=16, depth=2)") {
    import spark.implicits._
    // a 16-cell sketch over a 500-key multiset guarantees heavy
    // collisions in every cell — the estimate >= exact invariant must
    // hold REGARDLESS (it fails only if a cell ever undercounts)
    var s = 3L
    val keys = Seq.fill(2000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      "k" + java.lang.Long.remainderUnsigned(s, 500)
    }
    val df = keys.toDF("k")
    val sketch = CountMin.build(df, "k", depth = 2, width = 16)
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("exact_c"))
    val bad = CountMin.estimate(sketch, exact, "k", depth = 2, width = 16)
      .where(col("cms_c") < col("exact_c")).count()
    assert(bad == 0, s"$bad keys under-estimated under forced collisions")
  }

  test("heavyHitters on a caller frame: exact set under a planted skew") {
    import spark.implicits._
    // 3 planted heavy keys (1000 each) over 10k singleton keys: at
    // phiInverse=10, threshold = ceil(13000/10) = 1300 > 1000 → none
    // qualify; at phiInverse=5 → 2600 → none; at phiInverse=20 → 650 →
    // exactly the three planted keys
    val df = (Seq.fill(1000)("hot_a") ++ Seq.fill(1000)("hot_b") ++
      Seq.fill(1000)("hot_c") ++ (0 until 10000).map(i => s"cold_$i"))
      .toDF("k")
    val hh = CountMin.heavyHitters(df, "k", phiInverse = 20L, depth, width)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(hh.keySet == Set("hot_a", "hot_b", "hot_c"), s"got ${hh.keySet}")
    assert(hh.values.forall { case (c, t) => c == 1000L && t == 650L })
    val none = CountMin.heavyHitters(df, "k", phiInverse = 10L, depth, width)
    assert(none.collect().isEmpty, "threshold 1300 must admit no key")
  }

  test("null keys are ignored: they inflate neither total nor threshold " +
      "(ADVICE r9)") {
    import spark.implicits._
    // 10 "hot" + 5 cold + 985 nulls. With nulls counted, total=1000 →
    // threshold at phiInverse=100 would be 10 and only "hot" qualifies;
    // null-filtered, total=15 → threshold=1 and BOTH keys qualify.
    val df = (Seq.fill(10)(Some("hot")) ++ Seq.fill(5)(Some("cold")) ++
      Seq.fill(985)(Option.empty[String])).toDF("k")
    val sk = CountMin.build(df, "k", depth, width)
    val total = sk.where(col("fn") === 0)
      .agg(sum(col("c"))).collect()(0).getLong(0)
    assert(total == 15L, s"null keys leaked into the sketch total: $total")
    val hh = CountMin.heavyHitters(df, "k", phiInverse = 100L, depth, width)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("hot", "cold"),
      s"null keys shifted the heavy-hitter threshold: $hh")
  }

  test("CMS-prefiltered heavy hitters == naive exact heavy hitters") {
    // the pre-filter is a shuffle bound, never a semantics change: the
    // one-sided guarantee (est >= exact) means no true heavy hitter can
    // be dropped, and the exact-count cut evicts collision admits
    val rows = graft.queries.TextQueries.cmsHeavyHitters(spark, sf001)
      .collect()
    val hh = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = rows.head.getLong(3)
    val naive = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .where(col("c") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == naive, "heavy-hitter set or counts diverge from exact")
    assert(hh.nonEmpty, "threshold admits no tokens — test is vacuous")
  }

  test("prebuilt-cells heavyHitters is bitwise the inline-build form " +
      "(the memoized-artifact serving path changes cost, never results)") {
    import spark.implicits._
    val df = (Seq.fill(300)("hot") ++ (0 until 2000).map(i => s"cold_$i"))
      .toDF("k")
    val inline = CountMin.heavyHitters(df, "k", phiInverse = 10L,
      depth, width).collect().map(_.toSeq).toSet
    val cells = CountMin.collectSketch(df, "k", depth, width)
    val served = CountMin.heavyHitters(df, "k", phiInverse = 10L,
      depth, width, prebuiltCells = Some(cells))
      .collect().map(_.toSeq).toSet
    assert(inline.nonEmpty, "no heavy hitters — parity gate is vacuous")
    assert(served == inline,
      s"prebuilt-cells path diverges from inline build: $served vs $inline")
  }

  test("a mismatched prebuilt artifact is REJECTED by name, not " +
      "silently applied (ADVICE r12: wrong width/depth/family would " +
      "underestimate and break the lossless pre-filter)") {
    import spark.implicits._
    val df = (Seq.fill(300)("hot") ++ (0 until 500).map(i => s"cold_$i"))
      .toDF("k")
    val artifact = CountMin.collectSketch(df, "k", depth, width)
    // wrong width: the cell derivation would mod into a different range
    val e1 = intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", phiInverse = 10L, depth, width * 2,
        prebuiltCells = Some(artifact))
    }
    assert(e1.getMessage.contains("does not match the call"), e1.getMessage)
    // wrong depth: min over a different number of hash rows
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", phiInverse = 10L, depth + 1, width,
        prebuiltCells = Some(artifact))
    }
    // wrong hash family: same geometry, different placements
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", phiInverse = 10L, depth, width,
        hashFn = graft.functions.Hash60.xxSalted,
        prebuiltCells = Some(artifact))
    }
    // the matching call still serves
    assert(CountMin.heavyHitters(df, "k", phiInverse = 10L, depth, width,
      prebuiltCells = Some(artifact)).count() > 0)
  }

  test("one-sided guarantee and heavy-hitter exactness hold under the " +
      "xxhash64 production family; md5 defaults bit-unchanged (VERDICT r9 #1)") {
    val xx = graft.functions.Hash60.xxSalted
    val sk = CountMin.build(toks, "token", depth, width, xx)
    // estimate >= exact for every token under the xx family
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_c"))
    val est = CountMin.estimate(sk, exact.select("token"), "token",
      depth, width, xx)
    assert(est.join(exact, "token")
      .where(col("cms_c") < col("exact_c")).count() == 0,
      "xx-family estimate undercounts — one-sided guarantee broken")
    // heavyHitters under xx equals the naive exact heavy hitters; the
    // threshold is a constant column of the SAME result (re-running the
    // whole pipeline to read it would double the test's corpus passes)
    val hhRows = CountMin.heavyHitters(toks, "token", phiInverse = 200L,
      depth, width, xx).collect()
    assert(hhRows.nonEmpty,
      "no heavy hitters at phi=1/200 — the equality gate would be vacuous")
    val hh = hhRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = hhRows.head.getLong(3)
    val naive = exact.where(col("exact_c") >= threshold)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == naive, "xx-family heavy hitters diverge from exact")
    // families differ, and the default build still reproduces the
    // PRE-REFACTOR construction md5("seed:" || key) — rebuilt here from
    // first principles (Hash60.md5 + explicit concat), NOT by passing
    // md5Salted back in, which would be tautological against its own
    // default
    val md5Sk = CountMin.build(toks, "token", depth, width)
    assert(sk.exceptAll(md5Sk).count() > 0, "xx build == md5 build?")
    val preRefactor: (org.apache.spark.sql.Column, Int) =>
        org.apache.spark.sql.Column =
      (key, seed) => graft.functions.Hash60.md5(concat(lit(s"$seed:"), key))
    val rebuilt = CountMin.build(toks, "token", depth, width, preRefactor)
    assert(md5Sk.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(md5Sk).isEmpty,
      "default md5Salted drifted from the oracle's md5(concat) construction")
  }

  test("md5 family cell placement matches externally-computed constants " +
      "(ADVICE r10: the drift gate must not share the implementation)") {
    import spark.implicits._
    // Computed OUTSIDE the JVM: python3 hashlib,
    //   int(md5(f"{seed}:{key}").hexdigest()[:15], 16) % 1024
    // — the same math every CMS DuckDB oracle runs. If Md5Long60, the
    // salt prefix, or the pmod cell derivation drifts, these literals
    // fail regardless of what md5Salted's definition says today.
    val expected = Seq(
      ("the", 0, 486L), ("the", 1, 79L), ("the", 2, 112L), ("the", 3, 504L),
      ("alpha", 0, 911L), ("alpha", 1, 914L), ("alpha", 2, 535L), ("alpha", 3, 684L),
      ("lorem", 0, 742L), ("lorem", 1, 923L), ("lorem", 2, 267L), ("lorem", 3, 560L))
    val got = Seq("the", "alpha", "lorem").toDF("k")
      .select(col("k") +: (0 until depth).map(s =>
        CountMin.cell(col("k"), s, width).as(s"c$s")): _*)
      .collect()
      .flatMap(r => (0 until depth).map(s => (r.getString(0), s, r.getLong(s + 1))))
      .toSeq
    assert(got.sorted == expected.sorted,
      s"cell placement drifted from the externally-pinned constants: $got")
  }

  test("estimates are partitioning-independent (integer cells)") {
    val sketch1 = CountMin.build(toks.repartition(3), "token", depth, width)
    val sketch2 = CountMin.build(toks.repartition(17), "token", depth, width)
    val q = toks.select(col("token")).distinct().orderBy("token").limit(50)
    val e1 = CountMin.estimate(sketch1, q, "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e2 = CountMin.estimate(sketch2, q, "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e1 == e2)
  }
}
