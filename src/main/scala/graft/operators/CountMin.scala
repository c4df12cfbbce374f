package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column: a (depth × width) table of
  * integer counters, built with ONE hash-partitioned groupBy and merged
  * across shards/streams by cell-wise addition — the classic
  * fixed-memory frequency summary for corpus-scale token statistics.
  *
  * Why this sketch here: every cell is an INTEGER SUM, so the sketch —
  * and every estimate read from it — is bit-identical under any
  * partitioning, merge order, or engine (the same property [[Hll]] and
  * [[QuantileSketch]] get from integer register/bucket math), which is
  * what lets the DuckDB oracle check the whole path exactly. The hash
  * is a live [[graft.functions.Hash60]] family with the hash-row index
  * as a seed prefix — the default repo-standard 60-bit md5 lets the
  * oracle reproduce cell placement bit-for-bit; production callers
  * that need no oracle swap in xxhash64.
  *
  * Scale shape: build is map-side cell derivation + one groupBy whose
  * key space is at most depth × width (bounded, uniform — md5 cells
  * can't skew); the result is ≤ depth·width rows regardless of corpus
  * size, so it broadcasts for estimation and unions cell-wise for
  * incremental maintenance. Estimate cost per key batch: one broadcast
  * join + a depth-row min per key.
  */
object CountMin {

  /** Cell index of `key` under hash function `seed`.
    *
    * @param hashFn a SALTED 60-bit hash family
    *               ([[graft.functions.Hash60.md5Salted]] default /
    *               [[graft.functions.Hash60.xxSalted]] production):
    *               (key, seed) => hash. The family owns the salting —
    *               md5 prefixes a `"seed:"` string (what every CMS
    *               oracle recomputes); xx feeds the seed as a native
    *               xxhash64 argument, no per-row string. Cell/count
    *               math is hash-agnostic, so the one-sided guarantee
    *               holds under both (CountMinSpec), but sketches from
    *               different families must never be merged, and
    *               estimates must use the build's family.
    */
  def cell(key: Column, seed: Int, width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted): Column =
    pmod(hashFn(key, seed), lit(width))

  /** Build the sketch: (fn, cell, c) rows, absent cells implicitly 0.
    * Null keys are ignored (matching [[Hll.sketch]]'s null handling):
    * an unfiltered null would hash to a real cell per row — counting
    * toward [[heavyHitters]]'s total while never able to become a
    * candidate (ADVICE r9) — silently inflating the threshold and
    * potentially dropping true heavy hitters of the non-null
    * population.
    */
  def build(rows: DataFrame, keyCol: String, depth: Int,
      width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted): DataFrame =
    rows.where(col(keyCol).isNotNull)
      .select(posexplode(array(
        (0 until depth).map(s => cell(col(keyCol), s, width, hashFn)): _*))
        .as(Seq("fn", "cell")))
      .groupBy(col("fn"), col("cell"))
      .agg(count(lit(1)).as("c"))

  /** Merge two sketches of identical (depth, width): cell-wise sum.
    * sketch(A ⊎ B) == merge(sketch(A), sketch(B)) exactly — the
    * incremental-maintenance property (asserted in CountMinSpec).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("fn"), col("cell"))
      .agg(sum(col("c")).as("c"))

  /** Map-side per-occurrence estimate: each row of `rows` gains a
    * `cms_c` column = its key's CMS estimate, via `depth` broadcast
    * hash joins against the bounded sketch — no shuffle of `rows`.
    * The pre-filter step of [[heavyHitters]], exposed for harnesses
    * that measure the candidate fraction.
    */
  def estimateOccurrences(rows: DataFrame, keyCol: String,
      sketch: DataFrame, depth: Int, width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted): DataFrame =
    // null keys dropped, mirroring build: they are not in the sketch
    // and could never survive heavyHitters' exact cut anyway
    (0 until depth).foldLeft(
      rows.select(col(keyCol)).where(col(keyCol).isNotNull)) { (df, i) =>
      df.withColumn(s"cell_$i", cell(col(keyCol), i, width, hashFn))
        .join(broadcast(sketch.where(col("fn") === i)
          .select(col("cell").as(s"cell_$i"), col("c").as(s"c_$i"))),
          Seq(s"cell_$i"), "left")
    }.withColumn("cms_c",
      least((0 until depth).map(i => coalesce(col(s"c_$i"), lit(0L))): _*))
      .select(col(keyCol), col("cms_c"))

  /** A collected sketch plus the parameters it was built under. The
    * parameters travel WITH the cells because a consumer fed a
    * mismatched artifact (different width, depth, or hash family) does
    * not fail — it silently computes wrong cell lookups and
    * underestimates, breaking the one-sided guarantee [[heavyHitters]]
    * relies on for losslessness (ADVICE r12). Consumers `require` the
    * match instead.
    */
  final case class SketchArtifact(depth: Int, width: Int,
      familyTag: String, cells: Seq[(Int, Long, Long)])

  /** Stable tag of a salted hash family for artifact compatibility
    * checks. The two library families tag by identity ("md5"/"xx" are
    * single shared function values); an ad-hoc function gets a per-JVM
    * identity tag — safe, since an in-JVM artifact can only match an
    * artifact built with the SAME function instance.
    */
  private[graft] def familyTag(hashFn: (Column, Int) => Column): String =
    if (hashFn eq graft.functions.Hash60.md5Salted) "md5"
    else if (hashFn eq graft.functions.Hash60.xxSalted) "xx"
    else s"custom@${System.identityHashCode(hashFn)}"

  /** The bounded sketch collected to the driver (≤ depth·width rows by
    * construction) — the artifact form long-lived consumers memoize per
    * data version: build (or incrementally [[merge]]) once, then every
    * estimate/heavy-hitter call serves from the collected cells without
    * re-scanning the corpus. Feed back via
    * [[heavyHitters]](prebuiltCells = …) or
    * `artifact.cells.toDF("fn","cell","c")` into [[estimate]].
    */
  def collectSketch(rows: DataFrame, keyCol: String, depth: Int,
      width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted): SketchArtifact =
    SketchArtifact(depth, width, familyTag(hashFn),
      build(rows, keyCol, depth, width, hashFn)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)

  /** EXACT heavy hitters over `rows(keyCol)` with the sketch as a
    * lossless candidate pre-filter: keys occurring ≥ ⌈total/phiInverse⌉
    * times, with `total` read exactly from the sketch's own fn=0 cells
    * (each occurrence increments exactly one cell per hash row — no
    * extra pass). Occurrences are estimated MAP-SIDE via `depth`
    * broadcast joins against the ≤ depth·width-cell sketch and only
    * candidates reach the exact-count shuffle; the one-sided guarantee
    * (estimate ≥ true count) proves no true heavy hitter is dropped,
    * and the final exact cut evicts collision admits — so the result
    * is EXACT while the corpus-keyed shuffle carries only candidate
    * occurrences (CountMinSpec equality gate, PlanSpec shape gate).
    *
    * Triggers one corpus action (none with `prebuiltCells`): the
    * bounded sketch is collected to the driver (≤ depth·width rows by
    * construction) and re-shipped as a local relation, so nothing is
    * pinned in the executor cache and the threshold read costs no
    * extra job. Callers whose `rows` is expensive to recompute should
    * persist it across the two corpus passes — or pass a memoized
    * [[collectSketch]] result as `prebuiltCells`, which removes the
    * build pass entirely (the estimate + exact-cut pass over `rows` is
    * inherent to EXACTNESS and remains). Returns (keyCol, exact_c,
    * cms_c, threshold).
    */
  def heavyHitters(rows: DataFrame, keyCol: String, phiInverse: Long,
      depth: Int, width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted,
      prebuiltCells: Option[SketchArtifact] = None): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    prebuiltCells.foreach { a =>
      require(a.depth == depth && a.width == width &&
        a.familyTag == familyTag(hashFn),
        s"heavyHitters: prebuilt sketch artifact (depth=${a.depth}, " +
          s"width=${a.width}, family=${a.familyTag}) does not match the " +
          s"call (depth=$depth, width=$width, " +
          s"family=${familyTag(hashFn)}) — a mismatched artifact " +
          "silently underestimates and breaks the lossless pre-filter " +
          "guarantee")
    }
    val cells = prebuiltCells.getOrElse(
      collectSketch(rows, keyCol, depth, width, hashFn)).cells
    val total = cells.iterator.filter(_._1 == 0).map(_._3).sum
    val threshold = (total + phiInverse - 1L) / phiInverse
    val sketch = cells.toDF("fn", "cell", "c")
    estimateOccurrences(rows, keyCol, sketch, depth, width, hashFn)
      .where(col("cms_c") >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_c"), min(col("cms_c")).as("cms_c"))
      .where(col("exact_c") >= threshold)
      .withColumn("threshold", lit(threshold))
  }

  /** Point estimates for the keys in `keys(keyCol)`: min over the
    * depth counters each key hashes to. CMS guarantee: estimate ≥ true
    * count, with overestimate bounded by collisions. The sketch side is
    * ≤ depth·width rows → broadcast. Absent cells count as 0 (left
    * join + coalesce): a key hashing to any untouched cell estimates
    * 0 — exactly the never-seen-key answer — instead of inheriting the
    * min of only its occupied cells. Null lookup keys are DROPPED, the
    * same contract as [[build]]/[[estimateOccurrences]] (ADVICE r10:
    * a null key previously fell through the cell hash to a cms_c=0 row,
    * an answer for a key the sketch by contract never counted).
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int,
      hashFn: (Column, Int) => Column =
        graft.functions.Hash60.md5Salted): DataFrame = {
    // the join internals carry a __cms_ prefix: `keys` keeps ALL its
    // caller columns through the group-by, so a caller column named
    // fn/cell/c (c is a common count alias) used to either break the
    // join key resolution or make the coalesce ambiguous (r15 review).
    // The sketch's own (fn, cell, c) schema stays the documented
    // artifact contract — it is renamed only inside this join.
    val sk = sketch.toDF("__cms_fn", "__cms_cell", "__cms_c")
    val exploded = keys.where(col(keyCol).isNotNull).select(col("*"),
      posexplode(array(
        (0 until depth).map(s => cell(col(keyCol), s, width, hashFn)): _*))
        .as(Seq("__cms_fn", "__cms_cell")))
    val keyCols = keys.columns.map(col)
    exploded
      .join(broadcast(sk), Seq("__cms_fn", "__cms_cell"), "left")
      .groupBy(keyCols.toIndexedSeq: _*)
      .agg(min(coalesce(col("__cms_c"), lit(0L))).as("cms_c"))
  }
}
