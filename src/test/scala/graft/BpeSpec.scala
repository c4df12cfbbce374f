package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE training gates: the merge sequence on a hand-computed corpus,
  * deterministic tie-breaks, partitioning independence (exact integer
  * counts), encode round-trip, and termination when everything merges.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toks = graft.queries.TextQueries.tokens(col("text"))

  test("merge sequence matches the hand computation") {
    // words: abc ×2, abd ×1 → pairs: (a,b)=3, (b,c)=2, (b,d)=1
    // step0 merges (a,b); then (ab,c)=2 beats (ab,d)=1; then (ab,d)
    val df = Seq("abc abc", "abd").toDF("text").withColumn("t", toks)
    val m = Bpe.train(df, "t", numMerges = 10)
    assert(m.map(x => (x.left, x.right, x.freq)) == Seq(
      ("a", "b", 3L), ("ab", "c", 2L), ("ab", "d", 1L)))
    // loop stops early once every word is one symbol (3 < 10 merges)
    assert(m.map(_.rank) == Seq(0, 1, 2))
  }

  test("frequency ties break lexicographically") {
    // (a,b)=2 and (c,d)=2 tie at step 0 → (a,b) first
    val df = Seq("ab ab cd cd").toDF("text").withColumn("t", toks)
    val m = Bpe.train(df, "t", numMerges = 2)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("merge table is partitioning-independent on the corpus") {
    val docs = Tables.documents(spark, sf001).withColumn("t", toks)
    val a = Bpe.train(docs.repartition(1), "t", numMerges = 12)
    val b = Bpe.train(docs.repartition(7), "t", numMerges = 12)
    assert(a == b, "merge table depends on partitioning")
    assert(a.length == 12 && a.forall(_.freq > 0))
    // frequencies are non-increasing-ish is NOT required (merges create
    // new high-freq pairs), but ranks must be the training order
    assert(a.map(_.rank) == (0 until 12))
  }

  test("encodeWord applies merges lowest-rank-first") {
    val df = Seq("abc abc", "abd").toDF("text").withColumn("t", toks)
    val m = Bpe.train(df, "t", numMerges = 2) // (a,b) then (ab,c)
    assert(Bpe.encodeWord("abc", m) == Seq("abc"))
    assert(Bpe.encodeWord("abd", m) == Seq("ab", "d"))
    assert(Bpe.encodeWord("xyz", m) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("a", m) == Seq("a"))
  }

  test("maxVocab caps the trained vocabulary deterministically") {
    // with only the top-1 word (count desc, word asc ⇒ 'bb' ×3) in
    // vocab, the only step-0 pair is (b,b)
    val df = Seq("bb bb bb aa aa x").toDF("text").withColumn("t", toks)
    val m = Bpe.train(df, "t", numMerges = 1, maxVocab = 1)
    assert(m.map(x => (x.left, x.right, x.freq)) == Seq(("b", "b", 3L)))
  }
}
