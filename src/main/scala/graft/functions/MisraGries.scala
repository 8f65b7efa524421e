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
  * State is an OPEN-ADDRESSED String→long table mutated in place (round
  * 21, VERDICT r20 ask #3 — the r8 form was a `mutable.HashMap[String,
  * Long]`, which boxes every counter update and walks entry nodes; the
  * summary lives inside a Spark `Aggregator` buffer processing one row
  * per corpus shingle, so the per-insert allocations dominated the pass-1
  * insert path). Linear probing over power-of-two capacity, counts in a
  * parallel primitive `Array[Long]`: the found-hit path (every repeat of
  * a heavy item) is now hash + probe + `cnts(i) += 1` with ZERO
  * allocation. The decrement/trim sweeps compact into fresh arrays —
  * same O(capacity) as the old map sweep, amortized O(1)/item by the
  * classic each-sweep-destroys-k-count-units argument. Algorithm
  * semantics are bit-identical to the r8 form (MisraGriesSpec pins
  * parity against a boxed reference implementation); all methods return
  * the mutated buffer for chaining.
  */
object MisraGries {

  /** ≤ k−1 positive counters over open-addressed parallel arrays; n:
    * items consumed so far. `keys(i) == null` marks an empty slot.
    * Java-serializes compactly (live entries only — the capacity-sized
    * probe arrays are rebuilt on read; partial-aggregation buffers cross
    * the wire between Spark's partial and merge phases).
    */
  final class Summary private[MisraGries] (
      @transient private[functions] var keys: Array[String],
      @transient private[functions] var cnts: Array[Long],
      @transient private[functions] var live: Int,
      var n: Long) extends Serializable {

    /** number of counters currently held. */
    def size: Int = live

    private[functions] def mask: Int = keys.length - 1

    /** slot of `item`, or the empty slot where it would insert. */
    private[functions] def slotOf(item: String): Int = {
      var i = improve(item.hashCode) & mask
      while (keys(i) != null && !((keys(i) eq item) || keys(i).equals(item)))
        i = (i + 1) & mask
      i
    }

    /** current count of `item`, 0 if absent. */
    def count(item: String): Long = {
      val i = slotOf(item)
      if (keys(i) == null) 0L else cnts(i)
    }

    /** Driver-side map view (k-bounded — q132's finish/candidate read and
      * the specs; never on the per-item path).
      */
    def counts: mutable.HashMap[String, Long] = {
      val m = mutable.HashMap.empty[String, Long]
      var i = 0
      while (i < keys.length) {
        if (keys(i) != null) m.update(keys(i), cnts(i))
        i += 1
      }
      m
    }

    /** add `c` to `item` (inserting if absent), growing at 1/2 load. */
    private[functions] def add(item: String, c: Long): Unit = {
      val i = slotOf(item)
      if (keys(i) != null) cnts(i) += c
      else {
        keys(i) = item
        cnts(i) = c
        live += 1
        if (live * 2 > keys.length) grow()
      }
    }

    private def grow(): Unit = {
      val ok = keys; val oc = cnts
      keys = new Array[String](ok.length * 2)
      cnts = new Array[Long](ok.length * 2)
      live = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null) { val j = slotOf(ok(i)); keys(j) = ok(i); cnts(j) = oc(i); live += 1 }
        i += 1
      }
    }

    /** subtract `by` from every counter, drop non-positive survivors —
      * the shared kernel of the insert decrement (by=1) and the merge
      * trim (by=k-th largest). Compacts into fresh arrays sized to the
      * current capacity (survivor count only shrinks).
      */
    private[functions] def decrementAll(by: Long): Unit = {
      val ok = keys; val oc = cnts
      keys = new Array[String](ok.length)
      cnts = new Array[Long](ok.length)
      live = 0
      var i = 0
      while (i < ok.length) {
        if (ok(i) != null && oc(i) > by) {
          val j = slotOf(ok(i)); keys(j) = ok(i); cnts(j) = oc(i) - by; live += 1
        }
        i += 1
      }
    }

    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      out.writeInt(live)
      var i = 0
      while (i < keys.length) {
        if (keys(i) != null) { out.writeUTF(keys(i)); out.writeLong(cnts(i)) }
        i += 1
      }
    }

    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      val m = in.readInt()
      keys = new Array[String](capacityFor(m))
      cnts = new Array[Long](keys.length)
      live = 0
      var r = 0
      while (r < m) { add(in.readUTF(), in.readLong()); r += 1 }
    }
  }

  /** java.util.HashMap's hash spreader: short-string hashCodes differ
    * mostly in low bits already, but the shift mixes longer keys' high
    * bits into the table index.
    */
  private def improve(h: Int): Int = h ^ (h >>> 16)

  /** smallest power of two holding `m` entries under 1/2 load. */
  private def capacityFor(m: Int): Int = {
    var c = 8
    while (c < m * 2) c <<= 1
    c
  }

  def empty: Summary = new Summary(new Array[String](8), new Array[Long](8), 0, 0L)

  /** One stream item. When the summary is full and the item is absent,
    * every counter decrements by 1 (the incoming item's implicit 1 is
    * annihilated with them) — classic MG; the O(k) sweep amortizes to
    * O(1) per item because each sweep destroys k units of total count.
    */
  def insert(s: Summary, item: String, k: Int): Summary = {
    s.n += 1
    val i = s.slotOf(item)
    if (s.keys(i) != null) s.cnts(i) += 1L
    else if (s.live < k - 1) s.add(item, 1L)
    else s.decrementAll(1L)
    s
  }

  /** Mergeable-summaries rule: add counters pointwise; if more than k−1
    * survive, subtract the k-th largest counter value from every counter
    * and drop the non-positive ones (≤ k−1 stay positive by construction).
    * Error bounds add across merges, so the n/k guarantee holds for any
    * merge tree — exactly what Spark's partial-aggregation shape needs.
    */
  def merge(a: Summary, b: Summary, k: Int): Summary = {
    var i = 0
    while (i < b.keys.length) {
      if (b.keys(i) != null) a.add(b.keys(i), b.cnts(i))
      i += 1
    }
    a.n += b.n
    if (a.live > k - 1) {
      val vs = new Array[Long](a.live)
      var j = 0; var w = 0
      while (j < a.keys.length) {
        if (a.keys(j) != null) { vs(w) = a.cnts(j); w += 1 }
        j += 1
      }
      java.util.Arrays.sort(vs)
      a.decrementAll(vs(vs.length - k)) // k-th largest
    }
    a
  }
}
