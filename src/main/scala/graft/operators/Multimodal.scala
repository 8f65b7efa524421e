package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Multimodal-column operators: opaque binary blobs with typed metadata,
  * decode / feature-extract / resize / frame-sample (BASELINE.json north
  * star — the image/audio path of a training-data pipeline).
  *
  * No media libraries exist in this environment, so the DECODER is a
  * clearly-marked deterministic fake ([[FakeDecoder]]); everything Spark-side
  * is real and tested: the blob wire format, the `binary` column + metadata
  * struct schema, the batched `mapPartitions` feature-extraction shape (the
  * Scala analog of a Pandas-UDF/`mapInPandas` batch kernel: a model server
  * would receive each `grouped(batchSize)` slice as one inference batch),
  * and the frame-sampling stride arithmetic.
  *
  * 100 TB posture: blobs are opaque binary parquet columns, so scans prune
  * to (id, metadata) unless the blob is actually needed; featurization is a
  * narrow per-partition pass with bounded batch memory (batchSize × blob
  * size); no shuffle anywhere in the decode path.
  */
object Multimodal {

  /** Fake blob container: `"GFT0" ++ width(2B BE) ++ height(2B BE) ++
    * channels(1B) ++ payload`. Stands in for a real image/audio container
    * header the way PNG/WAV headers carry dimensions/rates.
    */
  object BlobCodec {
    val MagicStr = "GFT0"
    private val Magic = MagicStr.getBytes(StandardCharsets.US_ASCII)

    def encode(width: Int, height: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](Magic.length + 5 + payload.length)
      System.arraycopy(Magic, 0, out, 0, Magic.length)
      out(4) = ((width >> 8) & 0xFF).toByte
      out(5) = (width & 0xFF).toByte
      out(6) = ((height >> 8) & 0xFF).toByte
      out(7) = (height & 0xFF).toByte
      out(8) = (channels & 0xFF).toByte
      System.arraycopy(payload, 0, out, 9, payload.length)
      out
    }

    final case class Meta(format: String, width: Int, height: Int,
        channels: Int, payload_len: Int)

    /** Decode the header; null (→ dropped/flagged upstream) on a foreign
      * or truncated blob — same drop posture as the KPL decoder.
      */
    def decodeMeta(blob: Array[Byte]): Meta =
      if (blob == null || blob.length < 9 ||
        new String(blob, 0, 4, StandardCharsets.US_ASCII) != MagicStr) null
      else Meta(MagicStr,
        ((blob(4) & 0xFF) << 8) | (blob(5) & 0xFF),
        ((blob(6) & 0xFF) << 8) | (blob(7) & 0xFF),
        blob(8) & 0xFF,
        blob.length - 9)
  }

  /** STUB — deterministic fake media decoder. A real deployment swaps this
    * object for JNI/ONNX/ffmpeg bindings; the call shape — ONE invocation
    * per record BATCH, fixed-dim vectors out — is what the pipeline
    * depends on (a model server amortizes per-call overhead across the
    * batch, so the signature must be batch-level, not per-record).
    */
  object FakeDecoder {
    /** Batch invocation counter — the observable a real model server logs;
      * MultimodalSpec asserts exactly one call per mapPartitions batch.
      */
    val invocations = new java.util.concurrent.atomic.AtomicLong

    /** One feature vector per payload in the batch: feature i = first
      * 16 bits of md5("f<i>:" ++ payload-as-utf8) / 65535, in [0,1].
      * Deterministic, so the DuckDB oracle reproduces it arithmetically.
      */
    def features(batch: Seq[Array[Byte]], dim: Int): Seq[Seq[Double]] = {
      invocations.incrementAndGet()
      val md = MessageDigest.getInstance("MD5")
      batch.map { payload =>
        val text = new String(payload, StandardCharsets.UTF_8)
        (0 until dim).map { i =>
          md.reset()
          val d = md.digest(s"f$i:$text".getBytes(StandardCharsets.UTF_8))
          (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) / 65535.0
        }
      }
    }
  }

  private val encodeBlob = udf { (w: Int, h: Int, c: Int, payload: Array[Byte]) =>
    BlobCodec.encode(w, h, c, payload)
  }
  private val decodeMeta = udf { (blob: Array[Byte]) => BlobCodec.decodeMeta(blob) }

  final case class MmIn(doc_id: Long, data: Array[Byte])
  final case class MmFeat(doc_id: Long, features: Seq[Double])

  /** Batched featurization — the mapInPandas-analog batch kernel: each
    * `grouped(batchSize)` slice reaches the decoder as ONE batch call
    * (bounded memory: batchSize × blob size per task). Public so the spec
    * can assert the one-call-per-batch contract on a controlled input.
    */
  def featurize(in: org.apache.spark.sql.Dataset[MmIn], dim: Int,
      batchSize: Int = 64): org.apache.spark.sql.Dataset[MmFeat] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = FakeDecoder.features(batch.map(_.data), dim)
        batch.zip(feats).map { case (r, f) => MmFeat(r.doc_id, f) }
      }
    }
  }

  /** Blob table synthesized from documents: dimensions derived from doc_id,
    * payload = text bytes.
    */
  private def blobs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      encodeBlob(
        (lit(16) + col("doc_id") % 64).cast("int"),
        (lit(16) + col("doc_id") % 48).cast("int"),
        (lit(1) + col("doc_id") % 3).cast("int"),
        col("text").cast("binary")).as("blob"))

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- Q60
    // Metadata decode + resize plumbing: encode each document into a blob,
    // decode the container header back, emit a half-resolution resize plan.
    // The oracle recomputes what the header must contain — a full-table
    // encode/decode round-trip proof.
    Q("q60_mm_metadata", Some("""
      SELECT doc_id, 'GFT0' AS format,
        CAST(16 + doc_id % 64 AS INT) AS width,
        CAST(16 + doc_id % 48 AS INT) AS height,
        CAST(1 + doc_id % 3 AS INT)  AS channels,
        CAST(length(text) AS INT)     AS payload_len,
        CAST((16 + doc_id % 64) // 2 AS INT) AS resized_w,
        CAST((16 + doc_id % 48) // 2 AS INT) AS resized_h
      FROM documents""")) { (s, dir) =>
      blobs(s, dir)
        .select(col("doc_id"), decodeMeta(col("blob")).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.channels").as("channels"), col("m.payload_len").as("payload_len"),
          expr("m.width div 2").cast("int").as("resized_w"),
          expr("m.height div 2").cast("int").as("resized_h"))
    },

    // ---------------------------------------------------------------- Q61
    // Batched feature extraction over blobs: Dataset.mapPartitions with
    // grouped(64) batches — the mapInPandas-style batch kernel shape — then
    // engine-side rounding so both engines round identically. Output is
    // exploded to one scalar row per (doc_id, feature index): the driver's
    // checker sorts/hashes column values, and raw array<double> cells are
    // unhashable on the oracle side (r02 fail).
    Q("q61_mm_features", Some("""
      SELECT doc_id, CAST(i AS INT) AS feat_idx,
        round((
          (strpos('0123456789abcdef', substr(md5('f' || i || ':' || text), 1, 1)) - 1) * 4096 +
          (strpos('0123456789abcdef', substr(md5('f' || i || ':' || text), 2, 1)) - 1) * 256 +
          (strpos('0123456789abcdef', substr(md5('f' || i || ':' || text), 3, 1)) - 1) * 16 +
          (strpos('0123456789abcdef', substr(md5('f' || i || ':' || text), 4, 1)) - 1)
        ) / 65535.0, 6) AS feat
      FROM documents, range(0, 8) t(i)""")) { (s, dir) =>
      import s.implicits._
      val in = blobs(s, dir).select(col("doc_id"),
        // strip the container header: featurize the payload, not the frame
        expr("substring(blob, 10, 2147483647)").as("data")).as[MmIn]
      featurize(in, 8).toDF()
        .select(col("doc_id"), posexplode(col("features")).as(Seq("feat_idx", "f")))
        .select(col("doc_id"), col("feat_idx"),
          round(col("f"), 6).as("feat"))
    },

    // ---------------------------------------------------------------- Q62
    // Frame sampling: 4 fixed-stride 8-byte frames from each payload — the
    // video-keyframe access pattern (seek offsets, no full decode).
    Q("q62_mm_framesample", Some("""
      SELECT doc_id,
        array_to_string([ substr(text, 1 + j * (length(text) // 4), 8)
                          for j in range(0, 4) ], '|') AS frames
      FROM documents""")) { (s, dir) =>
      Tables.t(s, dir, "documents")
        .selectExpr("doc_id", """
          array_join(transform(sequence(0, 3), j ->
            substring(text, 1 + j * (length(text) div 4), 8)), '|') AS frames""")
    }
  )
}
