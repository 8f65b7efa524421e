package graft.kpl

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** KPL (Kinesis Producer Library) aggregated-record codec.
  *
  * Wire format (reference: /root/reference/consumer/consumer.go:22,169-191 and
  * /root/reference/aggregated/aggregated.proto:1-20):
  *
  * {{{
  *   magic 0xF3 0x89 0x9A 0xC2  |  proto2 AggregatedRecord body  |  MD5(body)
  * }}}
  *
  * proto2 schema (aggregated.proto:4-20):
  * {{{
  *   message AggregatedRecord {
  *     repeated string partition_key_table     = 1;
  *     repeated string explicit_hash_key_table = 2;
  *     repeated Record records                 = 3; }
  *   message Record {
  *     required uint64 partition_key_index     = 1;
  *     optional uint64 explicit_hash_key_index = 2;
  *     required bytes  data                    = 3;
  *     repeated Tag    tags                    = 4; }
  *   message Tag { required string key = 1; optional string value = 2; }
  * }}}
  *
  * No protobuf runtime exists in /opt/spark/jars (and spark-protobuf cannot
  * handle proto2 `required` anyway), so this is a hand-rolled byte-level
  * codec: a ~60-line varint parser for decode plus a small writer used by
  * tests and the produce-side aggregation path. Pure JVM, no Spark types —
  * callable from UDFs, Expressions and plain unit tests alike.
  */
object KplCodec {

  val Magic: Array[Byte] = Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)
  private val Md5Size = 16

  final case class Tag(key: String, value: Option[String])
  final case class SubRecord(
      partitionKeyIndex: Long,
      explicitHashKeyIndex: Option[Long],
      data: Array[Byte],
      tags: Seq[Tag])
  final case class AggregatedRecord(
      partitionKeyTable: Seq[String],
      explicitHashKeyTable: Seq[String],
      records: Seq[SubRecord])

  /** Magic-prefix detect — consumer.go:169-171. */
  def isAggregated(data: Array[Byte]): Boolean =
    data != null && data.length >= Magic.length &&
      Magic.indices.forall(i => data(i) == Magic(i))

  private val md5Tl: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** MD5-trailer VERIFICATION — the optional C4 extension (SURVEY §2 C4):
    * the reference strips the trailer without ever checking it
    * (consumer.go:174), and [[deaggregate]] keeps that parity; this
    * predicate is the strict-mode flag a pipeline can filter or alert on.
    * True iff `data` is a well-formed KPL frame (magic prefix + room for a
    * 16-byte trailer) whose body MD5 equals the trailer; false for
    * anything else — a total predicate, so the codegen'd expression stays
    * a primitive boolean with no null branch of its own.
    */
  def md5Ok(data: Array[Byte]): Boolean =
    isAggregated(data) && data.length >= Magic.length + Md5Size && {
      val md = md5Tl.get()
      md.reset()
      md.update(data, Magic.length, data.length - Magic.length - Md5Size)
      java.util.Arrays.equals(md.digest(), 0, Md5Size,
        data, data.length - Md5Size, data.length)
    }

  // ------------------------------------------------------------------ decode

  /** Mutable cursor over a byte slice; any structural violation throws and
    * is converted to None at the message boundary (mirrors proto.Unmarshal's
    * all-or-nothing error at consumer.go:177-179).
    */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        if (pos >= end) fail("truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      fail("varint too long")
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || len > end - pos) fail("truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len.toInt)
      pos += len.toInt
      out
    }

    /** Skip an unknown field of the given wire type (proto2 skips unknowns). */
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => if (end - pos < 8) fail("truncated fixed64") else pos += 8
      case 2 => readBytes()
      case 5 => if (end - pos < 4) fail("truncated fixed32") else pos += 4
      case _ => fail(s"unsupported wire type $wireType")
    }
  }

  private def str(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)

  private def decodeTag(b: Array[Byte]): Tag = {
    val r = new Reader(b, 0, b.length)
    var key: Option[String] = None; var value: Option[String] = None
    while (r.hasRemaining) {
      val tag = r.readVarint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => key = Some(str(r.readBytes()))
        case (2, 2) => value = Some(str(r.readBytes()))
        case _      => r.skip(wire)
      }
    }
    Tag(key.getOrElse(r.fail("Tag.key is required")), value)
  }

  private def decodeSubRecord(b: Array[Byte]): SubRecord = {
    val r = new Reader(b, 0, b.length)
    var pki: Option[Long] = None; var ehki: Option[Long] = None
    var data: Option[Array[Byte]] = None
    val tags = Seq.newBuilder[Tag]
    while (r.hasRemaining) {
      val tag = r.readVarint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 0) => pki = Some(r.readVarint())
        case (2, 0) => ehki = Some(r.readVarint())
        case (3, 2) => data = Some(r.readBytes())
        case (4, 2) => tags += decodeTag(r.readBytes())
        case _      => r.skip(wire)
      }
    }
    SubRecord(
      pki.getOrElse(r.fail("Record.partition_key_index is required")),
      ehki,
      data.getOrElse(r.fail("Record.data is required")),
      tags.result())
  }

  /** Decode a bare proto2 AggregatedRecord body (no magic/MD5 framing).
    * Returns None on any structural error — the caller drops the whole
    * physical record silently, exactly like consumer.go:177-179.
    */
  def decodeBody(body: Array[Byte]): Option[AggregatedRecord] =
    try {
      val r = new Reader(body, 0, body.length)
      val pkt = Seq.newBuilder[String]; val ehkt = Seq.newBuilder[String]
      val recs = Seq.newBuilder[SubRecord]
      while (r.hasRemaining) {
        val tag = r.readVarint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
        (field, wire) match {
          case (1, 2) => pkt += str(r.readBytes())
          case (2, 2) => ehkt += str(r.readBytes())
          case (3, 2) => recs += decodeSubRecord(r.readBytes())
          case _      => r.skip(wire)
        }
      }
      Some(AggregatedRecord(pkt.result(), ehkt.result(), recs.result()))
    } catch { case _: IllegalArgumentException => None }

  /** De-aggregate one framed physical record into (partitionKey, data)
    * children — consumer.go:173-191. Semantics preserved exactly:
    *  - body = data[4 : len-16] (MD5 trailer stripped, checksum NOT verified
    *    — the reference never checks it, consumer.go:174);
    *  - any decode error → empty result, whole record silently dropped;
    *  - child partition key = partition_key_table[partition_key_index];
    *  - tags and explicit hash keys are parsed but unused.
    * One deliberate divergence: an out-of-range partition_key_index panics
    * the reference process; here it is treated as a decode error (drop) so a
    * poisoned record cannot kill an executor.
    */
  def deaggregate(data: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (data == null || data.length < Magic.length + Md5Size) return Nil
    val body = java.util.Arrays.copyOfRange(data, Magic.length, data.length - Md5Size)
    decodeBody(body) match {
      case Some(agg)
          if agg.records.forall(r =>
            r.partitionKeyIndex >= 0 && r.partitionKeyIndex < agg.partitionKeyTable.size) =>
        agg.records.map(r => (agg.partitionKeyTable(r.partitionKeyIndex.toInt), r.data))
      case _ => Nil
    }
  }

  // ------------------------------------------------------------------ encode

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def writeField(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)
    def writeBytes(field: Int, b: Array[Byte]): Unit = {
      writeField(field, 2); writeVarint(b.length.toLong); out.write(b, 0, b.length)
    }
    def writeString(field: Int, s: String): Unit =
      writeBytes(field, s.getBytes(StandardCharsets.UTF_8))
    def writeUint(field: Int, v: Long): Unit = { writeField(field, 0); writeVarint(v) }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def encodeTag(t: Tag): Array[Byte] = {
    val w = new Writer
    w.writeString(1, t.key)
    t.value.foreach(w.writeString(2, _))
    w.bytes
  }

  private def encodeSubRecord(r: SubRecord): Array[Byte] = {
    val w = new Writer
    w.writeUint(1, r.partitionKeyIndex)
    r.explicitHashKeyIndex.foreach(w.writeUint(2, _))
    w.writeBytes(3, r.data)
    r.tags.foreach(t => w.writeBytes(4, encodeTag(t)))
    w.bytes
  }

  /** Encode a bare proto2 AggregatedRecord body. */
  def encodeBody(agg: AggregatedRecord): Array[Byte] = {
    val w = new Writer
    agg.partitionKeyTable.foreach(w.writeString(1, _))
    agg.explicitHashKeyTable.foreach(w.writeString(2, _))
    agg.records.foreach(r => w.writeBytes(3, encodeSubRecord(r)))
    w.bytes
  }

  /** Frame a body with magic prefix + MD5 trailer — mirrors the reference
    * test encoder (consumer_test.go:346-377) and is the produce-side
    * aggregation the reference left unimplemented (command/produce.go:26).
    */
  def frame(body: Array[Byte]): Array[Byte] = {
    val md5 = MessageDigest.getInstance("MD5").digest(body)
    Magic ++ body ++ md5
  }

  /** Aggregate (partitionKey, data) children into one framed KPL record —
    * the exact shape createAggregateRecord builds at consumer_test.go:346-377:
    * each child appends its key to the table and indexes it positionally.
    */
  def aggregate(children: Seq[(String, Array[Byte])]): Array[Byte] = {
    val keys = children.map(_._1)
    val recs = children.zipWithIndex.map { case ((_, data), i) =>
      SubRecord(i.toLong, None, data, Nil)
    }
    frame(encodeBody(AggregatedRecord(keys, Nil, recs)))
  }
}
