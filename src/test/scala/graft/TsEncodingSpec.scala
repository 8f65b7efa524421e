package graft

import java.nio.file.Files

/** Pins `Tables.tsUsSql` against BOTH event-time encodings the driver's
  * fixture has shipped: TIMESTAMP(NANOS) parquet arrives as BIGINT nanos
  * (spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS) arrives as
  * TIMESTAMP_NTZ. Round 11's fixture regeneration flipped nanos→micros and
  * broke every query doing literal `ts div 1000` arithmetic at ANALYSIS
  * time — bench recorded 10 crashed queries while the correctness report
  * silently dropped them. This spec fails fast on either encoding
  * regressing, without needing a bench run to notice.
  */
class TsEncodingSpec extends SparkSpec {

  // 2024-01-05 12:34:56.789012 UTC
  private val epochUs = 1704458096789012L

  test("tsUsSql on a BIGINT-nanos ts column yields epoch micros") {
    import spark.implicits._
    val df = Seq((1L, epochUs * 1000L)).toDF("event_id", "ts")
    assert(Tables.tsUsSql(df) == "ts div 1000")
    val got = df.selectExpr(s"${Tables.tsUsSql(df)} AS us").head().getLong(0)
    assert(got == epochUs)
  }

  test("tsUsSql on a TIMESTAMP_NTZ parquet ts column yields epoch micros") {
    val dir = Files.createTempDirectory("graft-ts-ntz").toString
    // write micros-precision TIMESTAMP_NTZ parquet — the round-12 fixture
    // encoding — and read it back through the same scan path queries use
    spark.range(1).selectExpr("id AS event_id",
      s"CAST(timestamp_micros(${epochUs}L) AS TIMESTAMP_NTZ) AS ts")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = df.selectExpr(s"${Tables.tsUsSql(df)} AS us").head().getLong(0)
    assert(got == epochUs)
  }

  test("the driver fixture's events table analyzes through tsUsSql") {
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    // analysis alone reproduced the round-11 breakage (DATATYPE_MISMATCH);
    // executing one row proves the full scan→derive path
    val us = ev.selectExpr(s"${Tables.tsUsSql(ev)} AS us").head().getLong(0)
    assert(us > 1500000000000000L) // sane epoch-µs (after 2017)
  }
}
