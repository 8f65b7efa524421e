package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-time window operators (SURVEY.md §7.2 M3) in their batch form so
  * they stay oracle-checkable (§7.3 risk 6): `window`/`session_window` work
  * identically under `groupBy` in batch and under watermarked streaming
  * aggregation — the streaming variants (watermark + late-data drop) are
  * exercised in StreamingSpec over MemoryStream.
  *
  * events.ts arithmetic goes through Tables.tsUsSql (epoch-µs BIGINT
  * regardless of the fixture's nanos/micros encoding); both engines window
  * over the µs timestamp. Window bounds are emitted as epoch_us BIGINTs.
  *
  * 100 TB posture: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — two-phase, no sort; session windows shuffle once on the
  * session key (user) and Spark's session-window exec merges sorted runs
  * per key, which is the textbook distributed gaps-and-islands plan.
  */
object WindowQueries {

  private def tsUs(e: org.apache.spark.sql.DataFrame): String =
    s"timestamp_micros(${Tables.tsUsSql(e)})"

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- Q50
    // Tumbling 1-hour counts per event type.
    Q("q50_tumbling_window", Some("""
      SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2""")) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
      e.selectExpr(s"${tsUs(e)} AS tss", "event_type")
        .groupBy(window(col("tss"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"))
    },

    // ---------------------------------------------------------------- Q51
    // Session windows: 30-minute inactivity gap per user. A new event at
    // exactly start+gap opens a NEW session (Spark's window is [start,
    // start+gap)), hence the `>=` break in the oracle's gaps-and-islands.
    Q("q51_session_window", Some("""
      WITH m AS (SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS brk
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      g AS (SELECT user_id, ts,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
             epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
             COUNT(*) AS n_events
      FROM g GROUP BY user_id, sid""")) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
      e.selectExpr(s"${tsUs(e)} AS tss", "user_id")
        .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("n_events"))
    },

    // ---------------------------------------------------------------- Q52
    // Sliding window: 1-hour windows every 30 minutes — each event lands in
    // exactly 2 windows; the oracle materializes both via unnest([0,1]).
    Q("q52_sliding_window", Some("""
      SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts) - k * (INTERVAL 30 MINUTE))
               AS window_start_us,
             COUNT(*) AS n
      FROM events, (SELECT unnest([0, 1]) AS k) t
      GROUP BY 1""")) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
      e.selectExpr(s"${tsUs(e)} AS tss")
        .groupBy(window(col("tss"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("window_start_us"), col("n"))
    },

    // ---------------------------------------------------------------- Q90
    // Interval join — the BATCH-equivalent of the watermarked stream-stream
    // inner join (StreamJoinSpec): each click joined to the same user's
    // purchases inside [click_ts, click_ts + 6h]. Identical join semantics
    // in both engines makes the streaming operator's core (time-bounded
    // equi-join) oracle-hashable, per SURVEY §7.3(6); the streaming variant
    // with watermark state eviction stays spec-covered. 100 TB posture:
    // shuffles once on user_id (exactly the streaming state-store
    // partitioning); the time bound evaluates inside each key partition,
    // the same pruning the watermark performs incrementally.
    Q("q90_interval_join", Some("""
      SELECT a.event_id AS click_id, b.event_id AS purchase_id,
        (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS lag_sec
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND epoch_us(b.ts) >= epoch_us(a.ts)
       AND epoch_us(b.ts) <= epoch_us(a.ts) + 21600000000
      WHERE a.event_type = 'click' AND b.event_type = 'purchase'""")) { (s, dir) =>
      val e = Tables.t(s, dir, "events")
      val us = Tables.tsUsSql(e)
      val clicks = e.filter(col("event_type") === "click")
        .selectExpr("event_id AS click_id", "user_id", s"$us AS click_us")
      val buys = e.filter(col("event_type") === "purchase")
        .selectExpr("event_id AS purchase_id", "user_id AS buyer_id",
          s"$us AS buy_us")
      clicks.join(buys,
        col("user_id") === col("buyer_id") &&
          col("buy_us") >= col("click_us") &&
          col("buy_us") <= col("click_us") + 21600000000L)
        .selectExpr("click_id", "purchase_id",
          "(buy_us - click_us) div 1000000 AS lag_sec")
    }
  )
}
