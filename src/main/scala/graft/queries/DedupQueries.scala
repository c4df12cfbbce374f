package graft.queries

/** Deduplication operators (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding near-dup) — filled in incrementally.
  */
object DedupQueries {
  def defs: Map[String, QueryDef] = Map()
}
