package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact top-N per key with BOUNDED partial state — the scale-correct
  * form of `row_number() OVER (PARTITION BY key ORDER BY ord) <= n`.
  *
  * The window form shuffles every row of every group and sorts whole
  * groups just to discard all but n rows; a hot key (the exact case
  * per-domain caps exist for) becomes one reducer sorting the domain.
  * This aggregator instead keeps a bounded buffer of the n best
  * (ord, id) pairs, and because Aggregator merge is associative,
  * Catalyst plans it as partial aggregation (ObjectHashAggregate
  * partial → shuffle → final, plan-asserted in TopNSpec): each map
  * task emits AT MOST n rows per key it saw, so the shuffle carries
  * ≤ n·P rows per key instead of the group — at 100 TB a 10^9-row
  * domain costs the same shuffle bytes as a 10^3-row one.
  *
  * Ties break by id ascending (the repo-wide determinism contract), so
  * the kept set is a pure function of the data. The payload is
  * recovered by joining the returned ids back against the source —
  * ord/id travel through the aggregate, not whole rows.
  */
object TopNByKey {

  /** One candidate: ordering value + unique tie-break id. `ord` is
    * optional so NULL ordering values (degraded rows — ragged/null
    * embeddings yield NULL distances) rank LAST in either direction,
    * matching the repo-wide `asc_nulls_last` window contract, instead
    * of silently decoding to 0.0 and ranking first.
    */
  final case class Cand(ord: Option[Double], id: Long)

  /** Encoder carrier — a bare Seq is not a Product. */
  final case class TopNBuf(rows: Seq[Cand])

  /** Bounded top-n buffer: keep the n smallest (ord, id) pairs when
    * `asc`, largest-ord (still smallest-id tie) otherwise. The buffer
    * is a plain unsorted vector scanned per insert — n is tens, not
    * millions, and ObjectHashAggregate keeps it as a live object
    * between rows (serialized only at the exchange).
    */
  private final class TopNAgg(n: Int, asc: Boolean)
      extends Aggregator[Cand, TopNBuf, TopNBuf] {

    /** true iff a ranks strictly better than b (nulls last, ties by id).
      * Doubles compare via `java.lang.Double.compare`, the total order
      * Spark's own sort uses — NaN is greatest (last under asc, first
      * under desc, exactly like the window ordering it replaces), and
      * the comparator stays transitive so a NaN candidate can neither
      * freeze the buffer nor break the final sort.
      */
    private def better(a: Cand, b: Cand): Boolean = (a.ord, b.ord) match {
      case (Some(x), Some(y)) =>
        val c = java.lang.Double.compare(x, y)
        if (c != 0) { if (asc) c < 0 else c > 0 } else a.id < b.id
      case (Some(_), None) => true
      case (None, Some(_)) => false
      case _ => a.id < b.id
    }

    /** Binary-search position of `a` in best-first-sorted `buf`. */
    private def insertPos(buf: Seq[Cand], a: Cand): Int = {
      var lo = 0
      var hi = buf.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(buf(mid), a)) lo = mid + 1 else hi = mid
      }
      lo
    }

    /** The buffer is kept sorted best-first, so the steady-state per-row
      * cost is ONE comparison against the current worst (O(1) reject);
      * an accepted candidate pays an O(log n) position search + one
      * vector copy, which happens only ~n·ln(rows/n) times per task.
      * This keeps large k (maxK is 10,000 on the ANN paths) from
      * degrading to an O(rows·k) scan.
      */
    private def insert(buf: Seq[Cand], a: Cand): Seq[Cand] = {
      if (a == null) buf
      else if (buf.size < n) buf.patch(insertPos(buf, a), Seq(a), 0)
      else if (better(a, buf.last))
        buf.patch(insertPos(buf, a), Seq(a), 0).dropRight(1)
      else buf
    }

    override def zero: TopNBuf = TopNBuf(Vector.empty)

    override def reduce(b: TopNBuf, a: Cand): TopNBuf = TopNBuf(insert(b.rows, a))

    override def merge(x: TopNBuf, y: TopNBuf): TopNBuf =
      if (x.rows.size >= y.rows.size) TopNBuf(y.rows.foldLeft(x.rows)(insert))
      else TopNBuf(x.rows.foldLeft(y.rows)(insert))

    // the buffer is maintained in rank order — finish is the identity
    override def finish(b: TopNBuf): TopNBuf = b

    override def bufferEncoder: Encoder[TopNBuf] = Encoders.product[TopNBuf]
    override def outputEncoder: Encoder[TopNBuf] = Encoders.product[TopNBuf]
  }

  /** Top-n rows per key. Returns `(keyCols…, rk, id, ord)` with rk
    * 1-based in rank order — join `id` back to the source for payload
    * columns.
    *
    * @param ord numeric ordering column (cast to double — exact for
    *            integers up to 2^53)
    * @param id  unique Long tie-break / payload key
    * @param asc false = largest ord first (caps "keep the best")
    */
  /** Helper/output names topN injects — key columns must not collide
    * with them or the result would carry duplicate column names (the
    * same guard Skew.saltedJoin and Sampling.weightedSample apply to
    * their injected columns).
    */
  private val ReservedCols = Set("__top", "__pos", "__c", "rk", "id", "ord")

  def topN(df: DataFrame, keyCols: Seq[String], ord: Column, id: Column,
      n: Int, asc: Boolean = true): DataFrame = {
    require(n > 0, s"n must be > 0: $n")
    val clash = keyCols.filter(ReservedCols.contains)
    require(clash.isEmpty,
      s"topN: key column(s) ${clash.mkString(", ")} collide with reserved " +
        s"helper/output names (${ReservedCols.toSeq.sorted.mkString(", ")}) — " +
        "rename them before ranking")
    val keys = keyCols.map(col)
    val agg = udaf(new TopNAgg(n, asc), Encoders.product[Cand])
    df.groupBy(keys: _*)
      .agg(agg(ord.cast("double"), id.cast("long")).as("__top"))
      .select((keys :+ posexplode(col("__top.rows")).as(Seq("__pos", "__c"))): _*)
      .select((keys :+ (col("__pos") + 1).cast("int").as("rk")) ++
        Seq(col("__c.id").as("id"), col("__c.ord").as("ord")): _*)
  }
}
