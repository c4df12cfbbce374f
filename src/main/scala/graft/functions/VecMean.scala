package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean aggregator over `array<float>` — the
  * distributed form of the reference's full centroid update
  * (`/root/reference/src/kmeans.rs:674-719`, A1 in SURVEY.md §2.4).
  *
  * Buffer is (element-wise double sums, count); merge is associative and
  * commutative, so Catalyst plans it as partial aggregation: each
  * partition reduces to one (sums, count) pair per group before the
  * shuffle — the shuffle carries k × dim doubles, not n × dim floats.
  * This is the operator you'd use to run a full distributed Lloyd
  * iteration when the training pool exceeds driver memory (the driver
  * pool path in KMeans.trainDriver covers every realistic nlist because
  * training is sample-bounded; this exists for the exhaustive case).
  */
object VecMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    require(a.length == sums.length,
      s"VecMean: ragged input — array of length ${a.length}, expected ${sums.length}")
    var i = 0
    while (i < a.length) { sums(i) += a(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    // only the UNTOUCHED zero buffer (count 0) may yield wholesale: an
    // empty sums array with count > 0 means genuine zero-length input
    // vectors were reduced, and dropping that count made the outcome
    // partitioning-dependent — the ragged require below fires when such
    // rows share a partition with d-length rows, but a partition
    // boundary used to silently swallow them instead (r15 review)
    if (x._1.isEmpty && x._2 == 0L) return y
    if (y._1.isEmpty && y._2 == 0L) return x
    require(x._1.length == y._1.length,
      s"VecMean: ragged input — merging lengths ${x._1.length} and ${y._1.length}")
    val sums = x._1
    var i = 0
    while (i < sums.length) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Float] =
    if (r._2 == 0L) Seq.empty
    else r._1.map(s => (s / r._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}
