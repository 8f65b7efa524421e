package graft

import graft.streaming.Stateful
import graft.streaming.Stateful.{CountOut, KeyedEvent, SessionOut}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Custom stateful streaming operators: state must persist across
  * micro-batches, sessions must close on gap or event-time timeout, and the
  * streaming sessionizer must agree with the batch `session_window` form
  * (the same equivalence q51's oracle rests on).
  */
class StatefulSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime

  private def startUpdate[T](ds: Dataset[T], name: String) =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()

  test("mapGroupsWithState running counts accumulate across micro-batches") {
    val input = MemoryStream[KeyedEvent](spark)
    val q = startUpdate(Stateful.runningCounts(input.toDS()), "counts_t")
    try {
      input.addData(KeyedEvent(1, ts("2024-01-01 00:00:01")),
        KeyedEvent(1, ts("2024-01-01 00:00:02")),
        KeyedEvent(2, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      input.addData(KeyedEvent(1, ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val rows = spark.table("counts_t").as[CountOut].collect()
      // batch 1 emitted (1,2) and (2,1); batch 2 re-emitted user 1 as 3 —
      // proof the per-key state survived the trigger boundary
      assert(rows.contains(CountOut(1, 2)) && rows.contains(CountOut(2, 1)))
      assert(rows.contains(CountOut(1, 3)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer closes on gap and on watermark timeout") {
    val input = MemoryStream[(Long, Timestamp)](spark)
    val events = input.toDF().toDF("user_id", "tss")
      .withWatermark("tss", "10 minutes")
      .as[KeyedEvent]
    val gapMs = 30L * 60 * 1000
    val q = startUpdate(Stateful.sessionize(events, gapMs), "sessions_t")
    try {
      // user 1: two events 10 min apart (one session), then one 110 min
      // later (gap > 30 min ⇒ closes session 1 inside the batch)
      input.addData(
        (1L, ts("2024-01-01 00:00:00")),
        (1L, ts("2024-01-01 00:10:00")),
        (1L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // advance the watermark far past 02:00+gap ⇒ event-time timeout
      // flushes user 1's open single-event session
      input.addData((2L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      input.addData((2L, ts("2024-01-01 08:00:00"))) // one more advance
      q.processAllAvailable()
      val got = spark.table("sessions_t").as[SessionOut].collect().toSet
      assert(got.contains(SessionOut(1,
        ms("2024-01-01 00:00:00"), ms("2024-01-01 00:10:00"), 2)), s"got $got")
      assert(got.contains(SessionOut(1,
        ms("2024-01-01 02:00:00"), ms("2024-01-01 02:00:00"), 1)), s"got $got")

      // streaming sessions for user 1 == batch session_window on same data
      val batch = Seq(
        (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")),
        (1L, ts("2024-01-01 02:00:00"))).toDF("user_id", "tss")
        .groupBy(col("user_id"), session_window(col("tss"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .selectExpr("user_id", "unix_millis(session_window.start) AS start_ms",
          // session_window's end is exclusive (last event + gap); our
          // sessionizer reports the last event time — align for compare
          "unix_millis(session_window.end) - 1800000 AS end_ms", "n AS n_events")
        .as[SessionOut].collect().toSet
      assert(batch.subsetOf(got.filter(_.user_id == 1L)), s"batch=$batch got=$got")
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark across batches") {
    val input = MemoryStream[(String, Timestamp)](spark)
    val deduped = input.toDF().toDF("content_hash", "tss")
      .withWatermark("tss", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_t")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("a", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // duplicate of "a" inside the watermark window: dropped
      input.addData(("a", ts("2024-01-01 00:05:00")), ("c", ts("2024-01-01 00:06:00")))
      q.processAllAvailable()
      input.addData(("d", ts("2024-01-01 03:00:00"))) // advance watermark
      q.processAllAvailable()
      val hashes = spark.table("dedup_t").select("content_hash")
        .as[String].collect().sorted.toSeq
      assert(hashes == Seq("a", "b", "c", "d"), s"got $hashes")
    } finally q.stop()
  }

  private def startAppend[T](ds: Dataset[T], name: String) =
    ds.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()

  test("streaming exact dedup: first-seen kept, dups counted, horizon expiry re-admits") {
    import graft.streaming.Stateful.{DedupEvent, HashedDoc}
    val input = MemoryStream[HashedDoc](spark)
    val docs = input.toDS().withWatermark("tss", "10 seconds")
    val q = startAppend(Stateful.dedupFirstSeen(docs, horizonMs = 60000L), "dedup_t")
    try {
      input.addData(
        HashedDoc(100L, 1L, ts("2024-01-01 00:00:01")),
        HashedDoc(100L, 2L, ts("2024-01-01 00:00:02")),
        HashedDoc(200L, 3L, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      input.addData(HashedDoc(100L, 4L, ts("2024-01-01 00:00:03")))
      q.processAllAvailable()
      val keeps1 = spark.table("dedup_t").as[DedupEvent]
        .collect().filter(_.kind == "keep").map(e => (e.h, e.doc_id)).toSet
      // first occurrence per hash only — the same-batch dup (doc 2) and
      // the cross-batch dup (doc 4) are both suppressed
      assert(keeps1 == Set((100L, 1L), (200L, 3L)))
      // watermark far past last_seen + horizon: states retire with their
      // suppression counts
      input.addData(HashedDoc(300L, 8L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val expired = spark.table("dedup_t").as[DedupEvent]
        .collect().filter(_.kind == "expired").map(e => (e.h, e.n_dups)).toMap
      assert(expired == Map(100L -> 2L, 200L -> 0L))
      // post-expiry re-arrival is a NEW first (the horizon contract)
      input.addData(HashedDoc(100L, 9L, ts("2024-01-01 01:00:30")))
      q.processAllAvailable()
      val keeps2 = spark.table("dedup_t").as[DedupEvent]
        .collect().filter(_.kind == "keep").map(e => (e.h, e.doc_id)).toSet
      assert(keeps2 == Set((100L, 1L), (200L, 3L), (300L, 8L), (100L, 9L)))
    } finally q.stop()
  }

  test("streaming dedup keep-set matches Spark's dropDuplicatesWithinWatermark") {
    import graft.streaming.Stateful.{DedupEvent, HashedDoc}
    val input = MemoryStream[HashedDoc](spark)
    def watermarked = input.toDS().withWatermark("tss", "10 seconds")
    val qc = startAppend(Stateful.dedupFirstSeen(watermarked, horizonMs = 60000L), "dedup_c")
    val qb = startAppend(Stateful.dedupWithinWatermarkBuiltin(watermarked), "dedup_b")
    try {
      input.addData(
        HashedDoc(100L, 1L, ts("2024-01-01 00:00:01")),
        HashedDoc(100L, 2L, ts("2024-01-01 00:00:02")),
        HashedDoc(200L, 3L, ts("2024-01-01 00:00:01")))
      qc.processAllAvailable(); qb.processAllAvailable()
      input.addData(HashedDoc(100L, 4L, ts("2024-01-01 00:00:03")))
      qc.processAllAvailable(); qb.processAllAvailable()
      val custom = spark.table("dedup_c").as[DedupEvent]
        .collect().filter(_.kind == "keep").map(e => (e.h, e.doc_id)).toSet
      val builtin = spark.table("dedup_b").as[HashedDoc]
        .collect().map(e => (e.h, e.doc_id)).toSet
      assert(custom == builtin)
      assert(custom == Set((100L, 1L), (200L, 3L)))
    } finally { qc.stop(); qb.stop() }
  }

  test("streaming dedup: out-of-order batch keeps the min-(event_time, doc_id) row deterministically") {
    import graft.streaming.Stateful.{DedupEvent, HashedDoc}
    // ADVICE r13: when ONE micro-batch carries out-of-timestamp-order
    // events, the kept ROW diverges from dropDuplicatesWithinWatermark
    // (arrival-order first) by design — this operator keeps the
    // min-(event_time, doc_id) row, which is replayable across
    // micro-batch re-executions. Pin the deterministic choice: doc 7
    // ARRIVES first but doc 5 has the earlier event time and wins.
    val input = MemoryStream[HashedDoc](spark)
    val docs = input.toDS().withWatermark("tss", "10 seconds")
    val q = startAppend(Stateful.dedupFirstSeen(docs, horizonMs = 60000L), "dedup_o")
    try {
      input.addData(
        HashedDoc(100L, 7L, ts("2024-01-01 00:00:05")),
        HashedDoc(100L, 5L, ts("2024-01-01 00:00:01")),
        HashedDoc(100L, 6L, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      val keeps = spark.table("dedup_o").as[DedupEvent]
        .collect().filter(_.kind == "keep").map(e => (e.h, e.doc_id)).toSet
      // earliest event time wins; the doc_id tie at 00:00:01 breaks low
      assert(keeps == Set((100L, 5L)))
    } finally q.stop()
  }
}
