package graft

import org.apache.spark.sql.functions._

/** Behavior specs for the dedup-resolution operators (LlmQueries q83/q87):
  * the connected-components pass must do genuinely TRANSITIVE work — merge
  * planted A~B~C chains whose endpoints share no LSH bucket — which 1-hop
  * canonical-min provably cannot.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q87 merges transitive chains that 1-hop resolution splits") {
    val corpus = operators.LlmQueries.chainCorpus(spark, sf).persist()
    val cc = operators.LlmQueries.connectedComponents(corpus)
      .select("doc_id", "canonical").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // recompute the 1-hop resolution (q83's shape) on the SAME corpus
    val bands = operators.LlmQueries.bandTable(corpus)
    val a = bands.select(col("doc_id"), col("band"), col("band_key"))
    val b = bands.select(col("doc_id").as("nbr_id"), col("band").as("band2"),
      col("band_key").as("band_key2"))
    val oneHop = a.join(b,
      a("band") === b("band2") && a("band_key") === b("band_key2"))
      .groupBy(col("doc_id")).agg(min(col("nbr_id")).as("canonical"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.unpersist()

    // fixed point is never ABOVE the 1-hop min, and strictly below it for
    // at least one doc: a chain endpoint whose only path to its canonical
    // runs through an intermediate near-dup (the planted A~B~C case)
    val both = cc.keySet intersect oneHop.keySet
    assert(both.forall(k => cc(k) <= oneHop(k)))
    val transitiveOnly = both.filter(k => cc(k) < oneHop(k))
    assert(transitiveOnly.nonEmpty,
      "no doc needed transitivity — planted chains all share endpoint buckets")

    // the planted chains themselves: most C(+20000) docs must resolve all
    // the way to their original A, two hops away
    val cDocs = cc.keys.filter(_ >= 20000).toSeq
    val merged = cDocs.count(k => cc(k) == k - 20000)
    assert(merged >= cDocs.size / 2,
      s"only $merged of ${cDocs.size} planted chains merged to the original")
  }

  test("over-cap buckets are dropped: candidate fan-out stays bounded") {
    import spark.implicits._
    // 500 copies of one text: every band bucket holds all 500 docs, so an
    // uncapped LSH self-join would emit C(500,2) ≈ 125k candidate pairs —
    // the boilerplate mega-bucket that kills the join at 100 TB. Plus one
    // normal near-dup pair (identical text, 2 members per bucket) that the
    // cap must NOT touch.
    val mega = (1L to 500L)
      .map(i => (i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val pair = Seq(
      (1001L, "the quick brown fox jumps over the lazy dog today"),
      (2001L, "the quick brown fox jumps over the lazy dog today"))
    val corpus = (mega ++ pair).toDF("doc_id", "text")

    val capped = operators.LlmQueries.candidatePairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1001L, 2001L)),
      s"cap must keep exactly the normal pair, got ${capped.size} pairs")

    // same generator with the cap lifted: the quadratic blow-up is real
    val uncapped = operators.LlmQueries.candidatePairs(corpus, cap = 1000).count()
    assert(uncapped >= 500L * 499 / 2,
      s"uncapped generator should explode quadratically, got $uncapped")

    // the CC resolution stays total under capping: every doc keeps a row,
    // mega docs resolve to themselves (no surviving edges), the pair merges
    val cc = operators.LlmQueries.connectedComponents(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 502, s"CC must cover every doc, got ${cc.size}")
    assert(cc(2001L) == 1001L && cc(1001L) == 1001L)
    assert((1L to 500L).forall(i => cc(i) == i),
      "mega-bucket docs must fall back to self-canonical, not merge")
  }
}
