package graft

import graft.kpl.KplCodec
import graft.operators.RecordPipeline
import graft.streaming._
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming semantics suite (SURVEY.md §7.2 M3): the emulated
  * Kinesis-shaped source's four start modes, per-trigger limit, closed-shard
  * skip, multi-stream fan-in; de-aggregation as a streaming transform;
  * watermark late-data drop; and the producer sink's error tolerance —
  * mirroring the reference's mocked-client test approach (fake the source,
  * assert the sink).
  */
class StreamingSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def tmp(): String = Files.createTempDirectory("graft-stream").toString

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write records into the spool for one stream. */
  private def spool(dir: String, stream: String, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), RecordSchema.schema)
      .write.mode(SaveMode.Append).parquet(s"$dir/$stream")

  private def rec(shard: String, seq: Long, at: String, key: String, data: String): Row =
    Row(shard, seq, ts(at), key, b(data), "NONE")

  /** Run a streaming frame to completion over current spool contents. */
  private def collectStream(df: DataFrame): Seq[Row] = {
    val name = s"t${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    spark.table(name).collect().toSeq
  }

  private def baseSpool(): String = {
    val dir = tmp()
    spool(dir, "s1", Seq(
      rec("shardId-000000000000", 1, "2024-01-01 00:00:00", "k1", "r1"),
      rec("shardId-000000000000", 2, "2024-01-01 01:00:00", "k2", "r2"),
      rec("shardId-000000000001", 3, "2024-01-01 02:00:00", "k3", "r3"),
      rec("shardId-000000000001", 4, "2024-01-01 03:00:00", "k4", "r4")))
    dir
  }

  test("TRIM_HORIZON reads everything") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    val rows = collectStream(r.load(spark))
    assert(rows.map(_.getAs[Long]("sequenceNumber")).sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("LATEST only surfaces records newer than the open-time high-water mark") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.Latest))
    val stream = r.load(spark) // snapshot marks taken here: max seq 2 and 4
    spool(dir, "s1", Seq(
      rec("shardId-000000000000", 5, "2024-01-01 04:00:00", "k5", "r5"),
      rec("shardId-000000000001", 6, "2024-01-01 05:00:00", "k6", "r6")))
    val rows = collectStream(stream)
    assert(rows.map(_.getAs[Long]("sequenceNumber")).sorted == Seq(5L, 6L))
  }

  test("AT_SEQUENCE_NUMBER starts from the given sequence number inclusive") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"),
      StartPosition.parse("AT_SEQUENCE_NUMBER", seq = Some(3L))))
    val rows = collectStream(r.load(spark))
    assert(rows.map(_.getAs[Long]("sequenceNumber")).sorted == Seq(3L, 4L))
  }

  test("AT_TIMESTAMP starts from the parsed RFC3339 instant") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"),
      StartPosition.parse("AT_TIMESTAMP", since = Some("2024-01-01T02:00:00Z"))))
    val rows = collectStream(r.load(spark))
    assert(rows.map(_.getAs[Long]("sequenceNumber")).sorted == Seq(3L, 4L))
  }

  test("AT_TIMESTAMP with no --since uses the zero time (reads everything)") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"),
      StartPosition.parse("AT_TIMESTAMP")))
    assert(collectStream(r.load(spark)).size == 4)
  }

  test("invalid --since fails fast before any stream starts (consumer.go:48-51)") {
    val e = intercept[IllegalArgumentException] {
      StartPosition.parse("AT_TIMESTAMP", since = Some("invalid-timestamp"))
    }
    assert(e.getMessage.contains("RFC3339"))
  }

  test("closed shards are skipped at startup (consumer.go:116-123)") {
    val dir = baseSpool()
    import spark.implicits._
    Seq(("shardId-000000000000", Option.empty[String]),
      ("shardId-000000000001", Some("seq-end")))
      .toDF("shardId", "endingSequenceNumber")
      .write.parquet(s"$dir/s1/_shards")
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    val rows = collectStream(r.load(spark))
    assert(rows.map(_.getAs[Long]("sequenceNumber")).sorted == Seq(1L, 2L))
  }

  test("multi-stream fan-in unions concurrently consumed streams (consumer.go:53-55)") {
    val dir = baseSpool()
    spool(dir, "s2", Seq(rec("shardId-000000000000", 9, "2024-01-01 00:30:00", "kx", "rx")))
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1", "s2"), StartPosition.TrimHorizon))
    val rows = collectStream(r.load(spark))
    assert(rows.size == 5)
    assert(rows.map(_.getAs[String]("stream")).distinct.sorted == Seq("s1", "s2"))
  }

  test("per-trigger limit caps each micro-batch (Limit analog, consumer.go:149-152)") {
    val dir = tmp()
    // 4 separate spool pushes = 4 files
    (1 to 4).foreach { i =>
      spool(dir, "s1", Seq(rec("shardId-000000000000", i.toLong, s"2024-01-01 0$i:00:00", s"k$i", s"r$i")))
    }
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"),
      StartPosition.TrimHorizon, limitPerTrigger = 1))
    val name = s"t${System.nanoTime()}"
    val q = r.load(spark).writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table(name).count() == 4)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 4, "1-file-per-trigger must yield 4 non-empty micro-batches")
    assert(batches.forall(_.numInputRows == 1))
  }

  test("deaggregation works as a streaming transform") {
    val dir = tmp()
    val framed = KplCodec.aggregate(Seq("a" -> b("x"), "b" -> b("y")))
    spool(dir, "s1", Seq(
      rec("shardId-000000000000", 1, "2024-01-01 00:00:00", "plain", "pl"),
      Row("shardId-000000000000", 2L, ts("2024-01-01 01:00:00"), "parent", framed, "NONE")))
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    val rows = collectStream(RecordPipeline.deaggregate(r.load(spark)))
    val out = rows.map(x => (x.getAs[String]("partitionKey"),
      new String(x.getAs[Array[Byte]]("data"), StandardCharsets.UTF_8))).sorted
    assert(out == Seq(("a", "x"), ("b", "y"), ("plain", "pl")))
  }

  test("watermark drops late events in streaming session aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("tss", "user_id")
      .withWatermark("tss", "1 hour")
      .groupBy(window(col("tss"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val name = s"t${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData((ts("2024-01-01 00:10:00"), 1L))
    q.processAllAvailable()
    // advance watermark far past the first window, then send a late event
    input.addData((ts("2024-01-01 06:00:00"), 1L))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 00:20:00"), 1L)) // late: before watermark
    q.processAllAvailable()
    input.addData((ts("2024-01-01 09:00:00"), 1L)) // closes the first window
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table(name)
      .select(unix_micros(col("window.start")).as("ws"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // late event must NOT have been added to the 00:00 window
    assert(emitted(ts("2024-01-01 00:00:00").getTime * 1000) == 1L)
  }

  test("produce → consume round trip through the spool (PutRecord emulation)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val input = MemoryStream[String]
    val records = input.toDF()
      .select(RecordPipeline.partitionKey(None).as("partitionKey"),
        col("value").cast("binary").as("data"))
    val q = records.writeStream
      .foreach(new ProduceSink.PutRecordWriter(dir, "out", nShards = 2, verbose = false))
      .start()
    input.addData("msg one", "msg two", "msg three")
    q.processAllAvailable()
    q.stop()
    val files = new java.io.File(s"$dir/out").listFiles().flatMap(_.listFiles()).toSeq
    assert(files.size == 3)
    val bodies = files.map { f =>
      val lines = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      lines.split("\n", 2)(1)
    }.sorted
    assert(bodies == Seq("msg one", "msg three", "msg two"))
  }

  test("producer tolerates per-record failures and continues (producer.go:44-46)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val input = MemoryStream[String]
    // a null partition key makes shardFor throw inside process() for that
    // record only; the stream must keep going and write the healthy rows
    val records = input.toDF()
      .select(when(col("value") === "poison", lit(null: String))
        .otherwise(col("value")).as("partitionKey"),
        col("value").cast("binary").as("data"))
    val q = records.writeStream
      .foreach(new ProduceSink.PutRecordWriter(dir, "out", nShards = 2, verbose = false))
      .start()
    input.addData("ok1", "poison", "ok2")
    q.processAllAvailable()
    q.stop()
    val files = new java.io.File(s"$dir/out").listFiles().flatMap(_.listFiles()).toSeq
    assert(files.size == 2)
  }

  test("produce-side aggregation round-trips through deaggregate (D4 done properly)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1 to 25).map(i => Row(s"key${i % 3}", b(s"payload$i"))), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("partitionKey",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.BinaryType))))
    val aggregated = ProduceSink.aggregateRecords(df, maxPerRecord = 4)
    assert(aggregated.collect().forall(r => KplCodec.isAggregated(r.getAs[Array[Byte]]("data"))))
    val restored = aggregated.collect()
      .flatMap(r => KplCodec.deaggregate(r.getAs[Array[Byte]]("data")))
      .map { case (k, d) => (k, new String(d, StandardCharsets.UTF_8)) }
    assert(restored.length == 25)
    assert(restored.toSet == (1 to 25).map(i => (s"key${i % 3}", s"payload$i")).toSet)
  }

  test("checkpoint restart resumes from committed offsets, no reprocessing") {
    val dir = tmp()
    val ckpt = s"$dir/_ckpt"
    val name = s"t${System.nanoTime()}"
    spool(dir, "s1", Seq(rec("shardId-000000000000", 1, "2024-01-01 00:00:00", "k1", "r1")))
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    def run(): Unit = {
      val q = r.load(spark).writeStream.format("parquet")
        .option("path", s"$dir/_out").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    run() // processes seq 1
    spool(dir, "s1", Seq(rec("shardId-000000000000", 2, "2024-01-01 01:00:00", "k2", "r2")))
    run() // NextShardIterator analog: resumes at the checkpointed offset
    val out = spark.read.parquet(s"$dir/_out")
      .select("sequenceNumber").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L), "each record delivered exactly once across restarts")
  }

  test("stream-info table renders the 6-row descriptor (consumer.go:88-114)") {
    val dir = baseSpool()
    val r = new StreamReader(StreamReaderConfig(dir, Seq("s1"), StartPosition.TrimHorizon))
    val info = r.streamInfo(spark, "s1", "Mon, 01 Jan 2024 00:00:00 UTC", "NONE", 24)
      .collect().map(x => (x.getString(0), x.getString(1))).toMap
    assert(info("Stream name:") == "s1")
    assert(info("Active:") == "2 shards")
    assert(info("Closed:") == "0 shards")
    assert(info("Retention:") == "24 hours")
  }
}
