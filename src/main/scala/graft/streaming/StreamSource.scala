package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Emulated Kinesis-semantics streaming source (SURVEY.md §2 A2–A6).
  *
  * No Kinesis connector exists offline, so a stream is emulated as a spool
  * directory layout the built-in parquet streaming source can tail:
  *
  * {{{
  *   <spoolDir>/<streamName>/part-....parquet    records (RecordSchema)
  *   <spoolDir>/<streamName>/_shards/....parquet shard metadata (optional)
  * }}}
  *
  * Mapping to the reference consumer (consumer/consumer.go):
  *  - shard discovery → Spark's file-source partition planning; the shard
  *    id is a column, `_shards` metadata drives the closed-shard skip
  *    (consumer.go:116-123) — underscore paths are invisible to the
  *    streaming file listing, so metadata never leaks into the data;
  *  - 4 iterator modes (consumer.go:120-135) → a start-position predicate
  *    evaluated against a snapshot taken when the query opens;
  *  - poll loop with Limit + Interval (consumer.go:136-167) →
  *    `maxFilesPerTrigger` (per-trigger rate cap) + processing-time trigger;
  *  - multi-stream fan-in (consumer.go:53-55) → streaming union;
  *  - NextShardIterator threading → the source's checkpointed offsets.
  *
  * At cluster scale this is the same architecture as any file-tailing
  * ingest: each micro-batch plans one task per file split, state lives in
  * the checkpoint, and the start-position predicate is a pushed-down filter.
  */
object RecordSchema {
  val schema: StructType = StructType(Seq(
    StructField("shardId", StringType),
    StructField("sequenceNumber", LongType),
    StructField("approximateArrivalTimestamp", TimestampType),
    StructField("partitionKey", StringType),
    StructField("data", BinaryType),
    StructField("encryptionType", StringType)))
}

/** Shard-iterator start position — the four modes of consumer.go:125-130
  * plus the RFC3339 `--since` parse with fail-fast on invalid input
  * (consumer.go:48-51,63-72; §2 C10/D3).
  */
sealed trait StartPosition
object StartPosition {
  case object Latest extends StartPosition
  case object TrimHorizon extends StartPosition
  final case class AtSequenceNumber(seq: Long) extends StartPosition
  final case class AtTimestamp(ts: java.time.Instant) extends StartPosition

  /** Parse CLI-shaped inputs. Mirrors the reference exactly:
    *  - invalid RFC3339 `since` under AT_TIMESTAMP fails fast with the
    *    reference's message shape (consumer.go:50);
    *  - AT_TIMESTAMP with no `since` uses the zero time — the reference
    *    sends Go's zero `time.Time`, i.e. everything (consumer.go:63-72);
    *  - the reference never wires a sequence number for AT_SEQUENCE_NUMBER
    *    (GetShardIteratorInput lacks it, consumer.go:125-130 — the AWS call
    *    would fail); here it is implemented properly via `seq`.
    */
  def parse(iteratorType: String, since: Option[String] = None,
      seq: Option[Long] = None): StartPosition = iteratorType match {
    case "LATEST"       => Latest
    case "TRIM_HORIZON" => TrimHorizon
    case "AT_SEQUENCE_NUMBER" =>
      AtSequenceNumber(seq.getOrElse(
        throw new IllegalArgumentException("AT_SEQUENCE_NUMBER needs a sequence number")))
    case "AT_TIMESTAMP" =>
      since match {
        case None => AtTimestamp(java.time.Instant.EPOCH)
        case Some(s) =>
          try AtTimestamp(java.time.OffsetDateTime.parse(s).toInstant)
          catch {
            case e: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"--since needs to be in RFC3339 format. $s: ${e.getMessage}")
          }
      }
    case other => throw new IllegalArgumentException(s"unknown iterator type $other")
  }
}

final case class StreamReaderConfig(
    spoolDir: String,
    streams: Seq[String],
    start: StartPosition = StartPosition.Latest,
    limitPerTrigger: Int = 500,
    intervalMs: Long = 100)

/** Reader over the spool layout. `load` returns the unbounded streaming
  * frame; `loadBatch` the bounded snapshot of the same data (same code path
  * minus readStream — SURVEY §7.0's batch-testable-first rule).
  */
final class StreamReader(cfg: StreamReaderConfig) {

  def trigger: org.apache.spark.sql.streaming.Trigger =
    org.apache.spark.sql.streaming.Trigger.ProcessingTime(cfg.intervalMs)

  /** Multi-stream fan-in: one filtered per-stream source, unioned. */
  def load(spark: SparkSession): DataFrame =
    cfg.streams.map(readOne(spark, _)).reduce(_ unionByName _)

  def loadBatch(spark: SparkSession): DataFrame =
    cfg.streams.map(readOneBatch(spark, _)).reduce(_ unionByName _)

  private def path(stream: String) = s"${cfg.spoolDir}/$stream"

  private def readOne(spark: SparkSession, stream: String): DataFrame = {
    val raw = spark.readStream
      .schema(RecordSchema.schema)
      .option("maxFilesPerTrigger", cfg.limitPerTrigger)
      .parquet(path(stream))
      .withColumn("stream", lit(stream))
    withStartAndShards(spark, stream, raw)
  }

  private def readOneBatch(spark: SparkSession, stream: String): DataFrame =
    withStartAndShards(spark, stream,
      spark.read.schema(RecordSchema.schema).parquet(path(stream))
        .withColumn("stream", lit(stream)))

  /** Apply the closed-shard skip and the start-position predicate. Both use
    * a snapshot taken at query-open time (the reference resolves shards and
    * iterators once at startup and never re-checks — consumer.go:74-86,
    * 121-123); the snapshot joins are stream-static broadcast joins.
    */
  private def withStartAndShards(spark: SparkSession, stream: String,
      df: DataFrame): DataFrame = {
    val openOnly = shardMeta(spark, stream) match {
      case Some(meta) =>
        val open = meta.filter(col("endingSequenceNumber").isNull).select("shardId")
        df.join(broadcast(open), Seq("shardId"), "left_semi")
      case None => df
    }
    cfg.start match {
      case StartPosition.TrimHorizon => openOnly
      case StartPosition.AtSequenceNumber(seq) =>
        openOnly.filter(col("sequenceNumber") >= seq)
      case StartPosition.AtTimestamp(ts) =>
        openOnly.filter(col("approximateArrivalTimestamp") >=
          lit(java.sql.Timestamp.from(ts)))
      case StartPosition.Latest =>
        // per-shard high-water mark at open; only strictly-newer records flow
        val marks = spark.read.schema(RecordSchema.schema).parquet(path(stream))
          .groupBy(col("shardId"))
          .agg(max(col("sequenceNumber")).as("__openSeq"))
        openOnly.join(broadcast(marks), Seq("shardId"), "left")
          .filter(col("sequenceNumber") > coalesce(col("__openSeq"), lit(Long.MinValue)))
          .drop("__openSeq")
    }
  }

  /** Optional shard metadata (`_shards/`): shardId + endingSequenceNumber,
    * closed iff the ending sequence number is present (consumer.go:116-118).
    */
  def shardMeta(spark: SparkSession, stream: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"${path(stream)}/_shards")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Stream-info table (§2 B6) — the 6-row key/value descriptor the verbose
    * consumer prints before streaming (consumer.go:88-114).
    */
  def streamInfo(spark: SparkSession, stream: String, created: String,
      encryption: String, retentionHours: Int): DataFrame = {
    val counts = shardMeta(spark, stream) match {
      case Some(meta) => meta.agg(
        sum(when(col("endingSequenceNumber").isNull, 1).otherwise(0)).as("active"),
        sum(when(col("endingSequenceNumber").isNotNull, 1).otherwise(0)).as("closed"))
      case None =>
        spark.read.schema(RecordSchema.schema).parquet(path(stream))
          .agg(countDistinct(col("shardId")).as("active"), lit(0L).as("closed"))
    }
    counts.select(explode(map(
      lit("Stream name:"), lit(stream),
      lit("Created at:"), lit(created),
      lit("Encryption:"), lit(encryption),
      lit("Retention:"), concat(lit(retentionHours.toString), lit(" hours")),
      lit("Active:"), concat(col("active").cast("string"), lit(" shards")),
      lit("Closed:"), concat(col("closed").cast("string"), lit(" shards"))
    )).as(Seq("k", "v")))
  }
}
