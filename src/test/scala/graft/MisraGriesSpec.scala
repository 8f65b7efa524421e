package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.util.Random

/** The two properties q132's exactness rests on, checked over randomized
  * streams, partitionings, and merge trees (seeded — failures reproduce):
  * the summary never exceeds k−1 counters, every estimate underestimates
  * by at most n/k, and every φ-hitter with φ ≥ 1/k survives ANY merge
  * shape. Plus the end-to-end kernel on a planted corpus across partition
  * counts — the result must be partitioning-invariant because the audit
  * pass is exact.
  */
class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish random stream over a small alphabet: item i has weight
    * ∝ 1/(i+1), so a handful of true heavy hitters always exist.
    */
  private def stream(rng: Random, n: Int, alphabet: Int): Seq[String] = {
    val w = Array.tabulate(alphabet)(i => 1.0 / (i + 1))
    val tot = w.sum
    Seq.fill(n) {
      var r = rng.nextDouble() * tot
      var i = 0
      while (i < alphabet - 1 && r >= w(i)) { r -= w(i); i += 1 }
      s"tok$i"
    }
  }

  private def mgOver(parts: Seq[Seq[String]], k: Int): MisraGries.Summary =
    parts.map { p =>
      p.foldLeft(MisraGries.empty)((s, it) => MisraGries.insert(s, it, k))
    }.reduceLeft((a, b) => MisraGries.merge(a, b, k))

  test("MG summary: size ≤ k−1, underestimate ≤ n/k, φ-hitters survive any merge shape") {
    val rng = new Random(421)
    for (trial <- 0 until 20) {
      val k = 2 + rng.nextInt(14) // tiny k forces constant decrements/merge-trims
      val n = 500 + rng.nextInt(4000)
      val items = stream(rng, n, 1 + rng.nextInt(40))
      val exact = mutable.HashMap.empty[String, Long]
      items.foreach(it => exact.update(it, exact.getOrElse(it, 0L) + 1L))
      // random partitioning into 1..8 parts (order preserved within parts)
      val nParts = 1 + rng.nextInt(8)
      val parts = items.grouped(math.max(1, (items.size + nParts - 1) / nParts)).toSeq
      val s = mgOver(parts, k)
      assert(s.n == n, "summary must count every item exactly once")
      assert(s.counts.size <= k - 1, s"trial $trial: ${s.counts.size} counters for k=$k")
      exact.foreach { case (it, c) =>
        val est = s.counts.getOrElse(it, 0L)
        assert(est <= c, s"trial $trial: MG must underestimate ($it: $est > $c)")
        assert(c - est <= n.toLong / k,
          s"trial $trial: error ${c - est} above n/k=${n / k} for $it")
      }
      // the containment guarantee q132's audit depends on
      exact.foreach { case (it, c) =>
        if (c * k > n)
          assert(s.counts.contains(it),
            s"trial $trial: φ-hitter $it (cnt=$c, n=$n, k=$k) missing from summary")
      }
    }
  }

  test("heavyHitters output is exact and partitioning-invariant on a planted corpus") {
    import spark.implicits._
    // planted boilerplate shingles repeated across 30 docs + noise docs
    // of mostly-unique tokens: n=800 shingles, planted count 30 → hitters
    // at φ=1/40 (30·40 > 800); k=64 ≥ φ⁻¹ (the containment guarantee's
    // requirement) while ~700 distinct noise shingles keep the 63-counter
    // summary under constant decrement pressure
    val rng = new Random(7)
    val docs =
      (0 until 30).map(i => (i.toLong, "the quick brown fox " + s"u$i v$i")) ++
      (30 until 200).map(i =>
        (i.toLong, Seq.fill(6)("n" + rng.nextInt(100000)).mkString(" ")))
    val expect = {
      // exact recount of every shingle across the corpus
      val counts = mutable.HashMap.empty[String, Long]
      var n = 0L
      docs.foreach { case (_, t) =>
        val ts = t.split(" ")
        ts.sliding(3).foreach { w =>
          if (w.length == 3) { counts.update(w.mkString(" "),
            counts.getOrElse(w.mkString(" "), 0L) + 1L); n += 1L }
        }
      }
      counts.filter { case (_, c) => c * 40L > n }.toMap
    }
    assert(expect.nonEmpty, "planted corpus must contain φ-hitters")
    for (nPart <- Seq(1, 3, 16)) {
      val df = docs.toDF("doc_id", "text").repartition(nPart)
      val got = operators.LlmQueries.heavyHitters(df, phiInv = 40L, k = 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"nPart=$nPart: exact audit must be partitioning-invariant")
    }
  }
}
