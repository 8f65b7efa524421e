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
}
