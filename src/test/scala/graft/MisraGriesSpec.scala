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

  // ---- boxed reference implementation: textbook Misra–Gries over an
  // immutable-snapshot sweep — pins the r21 open-addressed rewrite to the
  // exact counter values, not just the containment guarantee. (The r8
  // HashMap form mutated the map INSIDE `foreach`, which Scala 2.13's
  // mutable.HashMap does not support: the sweep visited only part of the
  // map — a latent lazy-decrement bug. That form still satisfied every MG
  // guarantee — skipped decrements only keep counters HIGHER, and a
  // counter is incremented only when its item arrives, so est ≤ true and
  // the superset containment both survive — and q132's exact audit pass
  // made the query output identical either way. The rewrite implements
  // the published sweep; this reference pins it.) ----
  private case class RefSummary(counts: mutable.HashMap[String, Long], var n: Long)
  private def refInsert(s: RefSummary, item: String, k: Int): RefSummary = {
    s.n += 1
    val cur = s.counts.getOrElse(item, 0L)
    if (cur > 0L) s.counts.update(item, cur + 1L)
    else if (s.counts.size < k - 1) s.counts.update(item, 1L)
    else s.counts.toSeq.foreach { case (key, c) =>
      if (c == 1L) s.counts.remove(key) else s.counts.update(key, c - 1L)
    }
    s
  }
  private def refMerge(a: RefSummary, b: RefSummary, k: Int): RefSummary = {
    b.counts.toSeq.foreach { case (key, c) =>
      a.counts.update(key, a.counts.getOrElse(key, 0L) + c)
    }
    a.n += b.n
    if (a.counts.size > k - 1) {
      val vs = a.counts.values.toArray
      java.util.Arrays.sort(vs)
      val kth = vs(vs.length - k)
      a.counts.toSeq.foreach { case (key, c) =>
        if (c - kth <= 0L) a.counts.remove(key) else a.counts.update(key, c - kth)
      }
    }
    a
  }

  test("open-addressed summary is counter-exact vs the boxed reference over random merge trees") {
    val rng = new Random(2101)
    for (trial <- 0 until 30) {
      val k = 2 + rng.nextInt(30)
      val n = 200 + rng.nextInt(3000)
      val items = stream(rng, n, 1 + rng.nextInt(60))
      val nParts = 1 + rng.nextInt(8)
      val parts = items.grouped(math.max(1, (items.size + nParts - 1) / nParts)).toSeq
      val got = mgOver(parts, k)
      val want = parts.map { p =>
        p.foldLeft(RefSummary(mutable.HashMap.empty, 0L))((s, it) => refInsert(s, it, k))
      }.reduceLeft((a, b) => refMerge(a, b, k))
      assert(got.n == want.n, s"trial $trial: n")
      assert(got.counts == want.counts,
        s"trial $trial (k=$k, nParts=$nParts): counter values diverge")
      // the serialization round-trip the Aggregator buffer pays
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(got); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[MisraGries.Summary]
      assert(back.n == got.n && back.counts == got.counts,
        s"trial $trial: java-serialization round-trip must preserve the summary")
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
