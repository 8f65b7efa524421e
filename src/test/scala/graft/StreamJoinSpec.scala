package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream joins: both sides watermarked, join condition bounded in
  * event time so state is finite — the streaming form of the q54 range
  * join. At scale the state store holds only rows inside the time bound
  * per key; without the bound Spark rejects the join (unbounded state).
  */
class StreamJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked stream-stream inner join matches within the time bound") {
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val buys = MemoryStream[(Long, Timestamp)](spark)
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "1 hour")
    val p = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "1 hour")
    val joined = c.join(p,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("interval 30 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_t").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      buys.addData(
        (1L, ts("2024-01-01 10:20:00")), // within 30 min of user 1's click → joins
        (2L, ts("2024-01-01 11:30:00")), // 85 min after user 2's click → no match
        (3L, ts("2024-01-01 10:10:00"))) // no click at all → no match
      q.processAllAvailable()
      val got = spark.table("ssj_t")
        .select("user_id", "buy_ts").as[(Long, Timestamp)].collect().toSet
      assert(got == Set((1L, ts("2024-01-01 10:20:00"))), s"got $got")
    } finally q.stop()
  }

  test("left outer stream-stream join emits null-padded row after watermark closes") {
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val buys = MemoryStream[(Long, Timestamp)](spark)
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "10 minutes")
    val p = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "10 minutes")
    val joined = c.join(p,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("interval 30 minutes"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssj_left_t").start()
    try {
      clicks.addData((7L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // no matching buy; advance both watermarks far past the join window
      clicks.addData((8L, ts("2024-01-01 13:00:00")))
      buys.addData((9L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      clicks.addData((8L, ts("2024-01-01 14:00:00"))) // extra nudge batch
      buys.addData((9L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val got = spark.table("ssj_left_t")
        .where(col("user_id") === 7L)
        .select("buy_user").collect()
      assert(got.length == 1 && got.head.isNullAt(0),
        s"expected one null-padded row for user 7, got ${got.toSeq}")
    } finally q.stop()
  }
}
