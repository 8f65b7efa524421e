package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import java.io.File
import java.math.BigInteger
import java.security.MessageDigest

/** Native DataSource V2 batch writer for the shard spool — the PutRecord
  * sink (SURVEY.md §2 B1/B2) as a first-class Spark sink rather than a
  * foreachBatch loop.
  *
  * Semantics mirrored from the reference producer:
  *  - shard routing = MD5(partitionKey) mod shardCount — Kinesis's hash-key
  *    ring (producer.go:39-43 delegates it to the service; we implement the
  *    documented MD5 mapping);
  *  - each record lands as `<path>/<stream>/<shard>/<seq 20-digit>.rec`
  *    containing `key \n payload` — exactly the layout
  *    [[graft.streaming.ProduceSink.PutRecordWriter]] writes and
  *    [[ShardSpoolSource]] reads, so native write → native read round-trips.
  *
  * Exactly-once: tasks stage records under `<path>/.staging/<writeId>/`;
  * the driver's `commit` assigns final per-shard sequence numbers (continuing
  * from the shard's high-water mark) and moves files into place; `abort`
  * deletes the staging tree. A retried task therefore never double-publishes
  * — the same two-phase shape a cluster deployment needs, with the rename
  * assumed atomic on the target filesystem (true for a posix spool; an
  * object-store deployment would swap in a manifest commit).
  */
object ShardSpoolSink {

  /** MD5-ring shard assignment: stable for a key across runs and engines. */
  def shardFor(key: String, shardCount: Int): String = {
    val d = MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
    val idx = new BigInteger(1, d).mod(BigInteger.valueOf(shardCount.toLong)).intValue()
    f"shardId-$idx%012d"
  }

  final case class StagedFile(shard: String, stagedPath: String)
  final case class StagedFiles(files: Seq[StagedFile]) extends WriterCommitMessage
}

class ShardSpoolWrite(opts: Map[String, String], inputSchema: StructType)
    extends Write with BatchWrite {
  private val path = opts.getOrElse("path",
    throw new IllegalArgumentException("graft-shards requires option 'path'"))
  private val stream = opts.getOrElse("stream",
    throw new IllegalArgumentException("graft-shards requires option 'stream'"))
  private val shardCount = opts.getOrElse("shardcount", "2").toInt
  private val writeId = java.util.UUID.randomUUID().toString
  private val keyIdx = inputSchema.fieldIndex("partitionKey")
  private val dataIdx = inputSchema.fieldIndex("data")

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardWriterFactory(path, stream, shardCount, writeId, keyIdx, dataIdx)

  /** Publish staged files into the spool, assigning dense per-shard seqs. */
  private def publish(messages: Array[WriterCommitMessage]): Unit = {
    val streamDir = new File(path, stream)
    // next sequence number per shard, continuing the existing spool
    val next = scala.collection.mutable.Map.empty[String, Long]
    def nextSeq(shard: String): Long = {
      val n = next.getOrElseUpdate(shard, {
        val d = new File(streamDir, shard)
        ShardSpoolSource.seqs(d).lastOption.getOrElse(-1L) + 1
      })
      next(shard) = n + 1
      n
    }
    messages.foreach {
      case ShardSpoolSink.StagedFiles(files) =>
        files.foreach { sf =>
          val dir = new File(streamDir, sf.shard)
          dir.mkdirs()
          val target = new File(dir, f"${nextSeq(sf.shard)}%020d.rec")
          val src = new File(sf.stagedPath)
          if (!src.renameTo(target))
            throw new java.io.IOException(s"commit failed: $src -> $target")
        }
      case _ => ()
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    publish(messages)
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteStaging()

  /** Streaming form: per-epoch staged commit; a `_epochs/<id>` marker makes
    * epoch replay after a restart a no-op (the micro-batch equivalent of
    * B1's synchronous per-record ack, upgraded to exactly-once).
    */
  override def toStreaming:
      org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
      private def epochMarker(epochId: Long) =
        new File(new File(new File(path, stream), "_epochs"), epochId.toString)

      override def createStreamingWriterFactory(info: PhysicalWriteInfo):
          org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
        StreamingShardWriterFactory(path, stream, shardCount, writeId, keyIdx, dataIdx)

      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
        val marker = epochMarker(epochId)
        if (!marker.exists()) { // replayed epoch after restart: skip
          publish(messages)
          marker.getParentFile.mkdirs()
          marker.createNewFile()
        }
        deleteStaging()
      }

      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        deleteStaging()
    }

  private def deleteStaging(): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    Option(new File(path, ".staging").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(writeId)).foreach(rm)
  }
}

/** Top-level (serializable) streaming factory: stages under
  * `.staging/<writeId>-<epochId>/` so each epoch commits independently.
  */
case class StreamingShardWriterFactory(path: String, stream: String,
    shardCount: Int, writeId: String, keyIdx: Int, dataIdx: Int)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long):
      DataWriter[InternalRow] =
    new ShardWriterFactory(path, stream, shardCount, s"$writeId-$epochId",
      keyIdx, dataIdx).createWriter(partitionId, taskId)
}

class ShardWriterFactory(path: String, stream: String, shardCount: Int,
    writeId: String, keyIdx: Int, dataIdx: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val stagingDir =
        new File(new File(new File(path, ".staging"), writeId), s"$partitionId-$taskId")
      private var n = 0L
      private val staged = Seq.newBuilder[ShardSpoolSink.StagedFile]

      override def write(row: InternalRow): Unit = {
        // PutRecord per row: explicit key required (B2's random-hex default
        // is applied upstream by RecordPipeline.partitionKey)
        val key = row.getUTF8String(keyIdx).toString
        val payload = row.getBinary(dataIdx)
        val shard = ShardSpoolSink.shardFor(key, shardCount)
        stagingDir.mkdirs()
        val f = new File(stagingDir, f"$n%020d.tmp")
        val out = new java.io.FileOutputStream(f)
        try { out.write(key.getBytes("UTF-8")); out.write('\n'); out.write(payload) }
        finally out.close()
        staged += ShardSpoolSink.StagedFile(shard, f.getAbsolutePath)
        n += 1
      }

      override def commit(): WriterCommitMessage =
        ShardSpoolSink.StagedFiles(staged.result())
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
