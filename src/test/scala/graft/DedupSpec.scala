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

  /** Symmetric path graph 0—1—…—d (no self-edges) plus its isolated docs. */
  private def chainGraph(d: Int) = {
    import spark.implicits._
    val docs = (0L to d.toLong).toDF("doc_id")
    val fwd = (0L until d.toLong).map(i => (i, i + 1))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    (docs, edges)
  }

  test("labelPropagation: pointer halving converges in O(log d) rounds") {
    // Chains of known diameter pin the pointer-halving claim as a measured
    // round count: each round applies one neighbor-min then one pointer
    // chase (label(label(x))), so reach grows geometrically (2, 6, 14, …
    // = 2^(r+1)-2 hops after r rounds) and a diameter-d chain must settle
    // in ≤ ceil(log2(d)) + 2 rounds (incl. the no-change confirmation
    // round). Without halving, a d=64 chain would need ~65 rounds — the
    // assertion fails loudly if the pointer join is ever dropped.
    for (d <- Seq(4, 16, 64)) {
      val (docs, edges) = chainGraph(d)
      val (labels, rounds) = operators.LlmQueries.labelPropagation(docs, edges)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == d + 1)
      assert(got.values.forall(_ == 0L),
        s"d=$d: every node must resolve to root 0, got ${got.filterNot(_._2 == 0L)}")
      val bound = math.ceil(math.log(d) / math.log(2)).toInt + 2
      assert(rounds <= bound,
        s"d=$d: $rounds rounds exceeds pointer-halving bound $bound")
    }
  }

  test("labelPropagation: self-edge-free symmetric edges cannot label-swap") {
    import spark.implicits._
    // The advisor's counterexample: on chain 1—2—3 WITHOUT self-edges, a
    // neighbors-only min lets labels swap (1↔2) while the sum stays fixed,
    // silently converging to wrong labels. The own-label term in the min
    // must make this resolve fully to 1.
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val (labels, _) = operators.LlmQueries.labelPropagation(docs, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $got")
  }

  test("labelPropagation: empty corpus returns empty labels, no NPE") {
    import spark.implicits._
    val docs = Seq.empty[Long].toDF("doc_id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val (labels, _) = operators.LlmQueries.labelPropagation(docs, edges)
    assert(labels.count() == 0L)
  }
}
