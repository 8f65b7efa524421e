package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via `KeyValueGroupedDataset`
  * `(flat)mapGroupsWithState` — the engine's escape hatch for semantics the
  * built-in windowed aggregations can't express (per-key session state with
  * explicit lifecycle, running accumulators emitted every trigger).
  *
  * 100 TB posture: state is partitioned by key across the cluster's state
  * store (RocksDB-backed in production configs), each key's state is O(1)
  * here (no event buffering — only counters/bounds), and event-time
  * timeouts bound state lifetime so the store can't grow unboundedly.
  */
object Stateful {

  /** `tss` must be the watermarked event-time column — replacing it with a
    * derived long would strip the watermark tag the event-time timeout needs.
    */
  final case class KeyedEvent(user_id: Long, tss: java.sql.Timestamp)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  final case class CountOut(user_id: Long, n_events: Long)

  // public: the state encoder's generated code needs public accessors
  final case class SessionState(start_ms: Long, end_ms: Long, n: Long)

  /** Gap-based sessionization with explicit per-key state: events within
    * `gapMs` of the open session's [start, end] interval extend it (start
    * can move DOWN for a late in-gap event); an event past end+gap closes
    * the open session (emitted immediately) and starts a new one; an
    * event-time timeout (watermark passing end+gap) flushes the final open
    * session. Semantics match batch `session_window(ts, gap)` (oracle
    * query q51) for all arrivals inside the open session's gap window.
    * Documented deviation: a late event older than start−gap belongs to an
    * already-emitted part of the timeline — it is emitted immediately as a
    * singleton session rather than re-merged (the state holds aggregates,
    * not raw events, so closed sessions cannot be reopened; batch
    * session_window over the same data could merge it with neighbors).
    *
    * Input must carry a watermark on the event-time column backing `tss`.
    */
  def sessionize(events: Dataset[KeyedEvent], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start_ms, s.end_ms, s.n))
          } else {
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            it.toSeq.map(_.tss.getTime).sorted.foreach { t =>
              open = open match {
                case Some(s) if t < s.start_ms - gapMs =>
                  // late event before the open session's gap window: its own
                  // (already-past) session — see scaladoc deviation note
                  closed += SessionOut(user, t, t, 1)
                  open
                case Some(s) if t <= s.end_ms + gapMs =>
                  Some(SessionState(math.min(s.start_ms, t), math.max(s.end_ms, t), s.n + 1))
                case Some(s) => // gap exceeded: close, start fresh
                  closed += SessionOut(user, s.start_ms, s.end_ms, s.n)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** `tss` must be the watermarked event-time column (same contract as
    * [[KeyedEvent]]); `h` is the content hash (xxhash64 of the normalized
    * text upstream), `doc_id` the record identity.
    */
  final case class HashedDoc(h: Long, doc_id: Long, tss: java.sql.Timestamp)

  /** `kind` ∈ {"keep", "expired"}: "keep" rows are the deduplicated
    * output stream (first occurrence per hash inside the horizon);
    * "expired" rows are per-hash observability emitted when the
    * watermark retires a key's state — `n_dups` suppressed duplicates.
    */
  final case class DedupEvent(h: Long, doc_id: Long, kind: String, n_dups: Long)

  final case class DedupState(first_id: Long, last_ms: Long, dups: Long)

  /** STREAMING exact dedup — first-seen-only per content hash within an
    * event-time horizon, the streaming face of q40's batch exact dedup.
    * The Spark-first form of this operator is the one-liner
    * [[dedupWithinWatermarkBuiltin]] (`dropDuplicatesWithinWatermark`);
    * this explicit-state variant exists for what the built-in cannot
    * express: per-hash SUPPRESSION COUNTS, emitted as "expired" stat rows
    * when the watermark retires a key — the observability a production
    * dedup stage reports (how much volume each duplicate cluster
    * contributed), priced at the same O(1) state per key.
    *
    * Semantics: the first event of a hash is emitted immediately with
    * kind "keep"; later events within the horizon are suppressed and
    * counted; once the watermark passes last_seen + horizon the state is
    * dropped and a re-arrival is a NEW first (exact dedup at 100 TB
    * needs a horizon — unbounded state is the alternative, and the batch
    * operator already covers the full-corpus case). The KEPT-HASH SET is
    * identical to the built-in's (spec-pinned); WHICH row represents a
    * hash can differ when one micro-batch carries out-of-timestamp-order
    * events: this operator deterministically keeps the min-(event_time,
    * doc_id) row of the batch, while `dropDuplicatesWithinWatermark`
    * keeps the arrival-order first — a deliberate choice, since a
    * deterministic keeper is replayable across micro-batch re-executions
    * and arrival order is not. State per key: 3 longs, event-time
    * timeout bounds the store size by the horizon's hash cardinality.
    */
  def dedupFirstSeen(docs: Dataset[HashedDoc], horizonMs: Long): Dataset[DedupEvent] = {
    implicit val outEnc = Encoders.product[DedupEvent]
    implicit val stEnc = Encoders.product[DedupState]
    implicit val keyEnc = Encoders.scalaLong
    docs.groupByKey(_.h)
      .flatMapGroupsWithState[DedupState, DedupEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (h, it, state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(DedupEvent(h, s.first_id, "expired", s.dups))
          } else {
            val events = it.toSeq.sortBy(e => (e.tss.getTime, e.doc_id))
            val out = Seq.newBuilder[DedupEvent]
            var s = state.getOption
            events.foreach { e =>
              val t = e.tss.getTime
              s = s match {
                case None =>
                  out += DedupEvent(h, e.doc_id, "keep", 0L)
                  Some(DedupState(e.doc_id, t, 0L))
                case Some(st) =>
                  Some(DedupState(st.first_id, math.max(st.last_ms, t), st.dups + 1))
              }
            }
            s.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last_ms + horizonMs)
            }
            out.result().iterator
          }
      }
  }

  /** The built-in form: Spark's own watermark-horizon exact dedup. Kept
    * as the DEFAULT path (state managed by the engine, no custom code on
    * the hot path); [[dedupFirstSeen]] is the observability variant. The
    * spec pins that both keep the same rows.
    */
  def dedupWithinWatermarkBuiltin(docs: Dataset[HashedDoc]): Dataset[HashedDoc] =
    docs.dropDuplicatesWithinWatermark("h")

  /** Running per-key event count, re-emitted on every trigger that touches
    * the key — state persists across micro-batches (the property the spec
    * asserts; a stateless agg would reset between triggers).
    */
  def runningCounts(events: Dataset[KeyedEvent]): Dataset[CountOut] = {
    implicit val outEnc = Encoders.product[CountOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Long, CountOut](GroupStateTimeout.NoTimeout()) {
        (user, it, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          CountOut(user, n)
      }
  }
}
