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
