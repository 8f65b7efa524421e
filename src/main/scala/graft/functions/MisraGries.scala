package graft.functions

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982, "Finding
  * repeated elements"; merge rule from Agarwal et al. 2012, "Mergeable
  * Summaries", PODS) — the DETERMINISTIC-guarantee counterpart to the
  * engine's CMS scale path (q112): a summary of at most k−1 counters
  * over a stream of n items underestimates every item's count by at most
  * n/k, so every item with true frequency > n/k is GUARANTEED present in
  * the summary regardless of stream order, partitioning, or merge shape.
  * That containment guarantee is what makes the q132 two-pass plan exact:
  * pass 1 surfaces a candidate superset with bounded state, pass 2 audits
  * candidates with exact counts — the output is the exact φ-heavy-hitter
  * set even though the intermediate summary is order-dependent.
  *
  * State is a mutable map mutated in place: the summary lives inside a
  * Spark `Aggregator` buffer processing one row per corpus token, so
  * per-insert allocation would dominate. All methods return the mutated
  * buffer for chaining.
  */
object MisraGries {

  /** counts: ≤ k−1 positive counters; n: items consumed so far. */
  final class Summary(val counts: mutable.HashMap[String, Long], var n: Long)
      extends Serializable

  def empty: Summary = new Summary(mutable.HashMap.empty, 0L)

  /** One stream item. When the summary is full and the item is absent,
    * every counter decrements by 1 (the incoming item's implicit 1 is
    * annihilated with them) — classic MG; the O(k) sweep amortizes to
    * O(1) per item because each sweep destroys k units of total count.
    */
  def insert(s: Summary, item: String, k: Int): Summary = {
    s.n += 1
    val cur = s.counts.getOrElse(item, 0L)
    if (cur > 0L) s.counts.update(item, cur + 1L)
    else if (s.counts.size < k - 1) s.counts.update(item, 1L)
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      s.counts.foreach { case (key, c) =>
        if (c == 1L) dead += key else s.counts.update(key, c - 1L)
      }
      dead.foreach(s.counts.remove)
    }
    s
  }

  /** Mergeable-summaries rule: add counters pointwise; if more than k−1
    * survive, subtract the k-th largest counter value from every counter
    * and drop the non-positive ones (≤ k−1 stay positive by construction).
    * Error bounds add across merges, so the n/k guarantee holds for any
    * merge tree — exactly what Spark's partial-aggregation shape needs.
    */
  def merge(a: Summary, b: Summary, k: Int): Summary = {
    b.counts.foreach { case (key, c) =>
      a.counts.update(key, a.counts.getOrElse(key, 0L) + c)
    }
    a.n += b.n
    if (a.counts.size > k - 1) {
      val vs = a.counts.values.toArray
      java.util.Arrays.sort(vs)
      val kth = vs(vs.length - k) // k-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.counts.foreach { case (key, c) =>
        if (c - kth <= 0L) dead += key else a.counts.update(key, c - kth)
      }
      dead.foreach(a.counts.remove)
    }
    a
  }
}
