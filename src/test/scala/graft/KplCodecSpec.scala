package graft

import graft.kpl.KplCodec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Pure-codec suite — ports the reference's consumer tests
  * (consumer_test.go) that exercise the KPL wire format, plus scalacheck
  * round-trip properties the Go suite hand-rolled.
  */
class KplCodecSpec extends AnyFunSuite {

  /** Run a scalacheck property under ScalaTest (scalatestplus bridge is not
    * in the offline cache, so drive scalacheck's runner directly).
    */
  private def check(prop: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  // ---- TestIsAggregated (consumer_test.go:299-323)
  test("isAggregated: plain bytes are not aggregated") {
    assert(!KplCodec.isAggregated(b("not aggregated")))
  }
  test("isAggregated: magic-prefixed bytes are aggregated") {
    assert(KplCodec.isAggregated(KplCodec.Magic ++ b("aggregated")))
  }
  test("isAggregated: null and short inputs") {
    assert(!KplCodec.isAggregated(null))
    assert(!KplCodec.isAggregated(Array[Byte](0xF3.toByte)))
    assert(KplCodec.isAggregated(KplCodec.Magic)) // prefix alone matches, like bytes.HasPrefix
  }

  // ---- TestDeaggregate round trip (consumer_test.go:325-344 + 346-377)
  test("deaggregate(aggregate(x)) == x") {
    val input = Seq("key1" -> b("record1"), "key2" -> b("record2"))
    val framed = KplCodec.aggregate(input)
    assert(KplCodec.isAggregated(framed))
    val out = KplCodec.deaggregate(framed)
    assert(out.map(_._1) == Seq("key1", "key2"))
    assert(out.map(p => new String(p._2, StandardCharsets.UTF_8)) == Seq("record1", "record2"))
  }

  test("duplicate partition keys keep positional table entries") {
    val input = Seq("k" -> b("a"), "k" -> b("b"))
    val out = KplCodec.deaggregate(KplCodec.aggregate(input))
    assert(out.map(_._1) == Seq("k", "k"))
  }

  // ---- decode-error drop semantics (consumer.go:177-179)
  test("corrupt body → whole record silently dropped") {
    val corrupt = KplCodec.Magic ++ Array.fill(20)(0xFF.toByte)
    assert(KplCodec.deaggregate(corrupt) == Nil)
  }
  test("truncated frame → dropped") {
    val framed = KplCodec.aggregate(Seq("key1" -> b("record1")))
    val truncated = framed.dropRight(framed.length / 2)
    assert(KplCodec.deaggregate(truncated) == Nil)
  }
  test("frame shorter than magic+md5 → dropped") {
    assert(KplCodec.deaggregate(KplCodec.Magic) == Nil)
    assert(KplCodec.deaggregate(null) == Nil)
  }
  test("missing required Record.data → dropped") {
    // hand-encode: records[0] = { partition_key_index = 0 } (no data field)
    val sub = Array[Byte](0x08, 0x00) // field 1 varint 0
    val body = Array[Byte](0x0A, 0x02, 'p', 'k', // partition_key_table "pk"
      0x1A, sub.length.toByte) ++ sub             // records[0]
    assert(KplCodec.decodeBody(body).isEmpty)
    assert(KplCodec.deaggregate(KplCodec.frame(body)) == Nil)
  }
  test("out-of-range partition_key_index → dropped (reference would panic)") {
    val agg = KplCodec.AggregatedRecord(Seq("only"),
      Nil, Seq(KplCodec.SubRecord(5L, None, b("x"), Nil)))
    assert(KplCodec.deaggregate(KplCodec.frame(KplCodec.encodeBody(agg))) == Nil)
  }

  test("unknown fields are skipped, not fatal") {
    val body = KplCodec.encodeBody(KplCodec.AggregatedRecord(
      Seq("k"), Nil, Seq(KplCodec.SubRecord(0L, None, b("payload"), Nil))))
    val extra = Array[Byte](0x78, 0x2A) // field 15 wire 0, varint 42
    val out = KplCodec.deaggregate(KplCodec.frame(body ++ extra))
    assert(out.map(_._1) == Seq("k"))
  }

  test("explicit hash keys and tags decode and are carried (then unused)") {
    val agg = KplCodec.AggregatedRecord(
      Seq("pk0"), Seq("ehk0"),
      Seq(KplCodec.SubRecord(0L, Some(0L), b("data"),
        Seq(KplCodec.Tag("tk", Some("tv")), KplCodec.Tag("solo", None)))))
    val decoded = KplCodec.decodeBody(KplCodec.encodeBody(agg))
    assert(decoded.exists(_.explicitHashKeyTable == Seq("ehk0")))
    assert(decoded.exists(_.records.head.tags ==
      Seq(KplCodec.Tag("tk", Some("tv")), KplCodec.Tag("solo", None))))
    // consumer.go:183-188 only surfaces (partitionKey, data):
    assert(KplCodec.deaggregate(KplCodec.frame(KplCodec.encodeBody(agg)))
      .map(_._1) == Seq("pk0"))
  }

  test("non-UTF8 binary payloads survive the round trip") {
    val payload = Array.tabulate(256)(i => i.toByte)
    val out = KplCodec.deaggregate(KplCodec.aggregate(Seq("bin" -> payload)))
    assert(out.head._2.toSeq == payload.toSeq)
  }

  test("md5 trailer is stripped but never verified (reference parity)") {
    val body = KplCodec.encodeBody(KplCodec.AggregatedRecord(
      Seq("k"), Nil, Seq(KplCodec.SubRecord(0L, None, b("d"), Nil))))
    val badMd5 = KplCodec.Magic ++ body ++ Array.fill(16)(0x00.toByte)
    assert(KplCodec.deaggregate(badMd5).map(_._1) == Seq("k"))
  }

  test("md5Ok extension: valid frames verify, any corruption fails") {
    val frame = KplCodec.aggregate(Seq(
      "k1" -> b("payload one"), "k2" -> b("payload two")))
    assert(KplCodec.md5Ok(frame), "pristine frame must verify")
    // one flipped BODY byte (magic is 0-3, body starts at 4)
    val bodyTamper = frame.clone()
    bodyTamper(6) = (bodyTamper(6) ^ 0x01).toByte
    assert(!KplCodec.md5Ok(bodyTamper))
    // one flipped TRAILER byte
    val trailerTamper = frame.clone()
    trailerTamper(frame.length - 1) = (trailerTamper(frame.length - 1) ^ 0x01).toByte
    assert(!KplCodec.md5Ok(trailerTamper))
    // non-KPL, truncated, and null inputs are all simply "not verified"
    assert(!KplCodec.md5Ok(b("plain record")))
    assert(!KplCodec.md5Ok(KplCodec.Magic)) // magic with no room for a trailer
    assert(!KplCodec.md5Ok(null))
    // and deaggregate still accepts what md5Ok rejects (reference parity):
    // verification is an EXTENSION, never a gate on the parity path
    val body = KplCodec.encodeBody(KplCodec.AggregatedRecord(
      Seq("k"), Nil, Seq(KplCodec.SubRecord(0L, None, b("d"), Nil))))
    val badMd5 = KplCodec.Magic ++ body ++ Array.fill(16)(0x00.toByte)
    assert(!KplCodec.md5Ok(badMd5) && KplCodec.deaggregate(badMd5).nonEmpty)
  }

  // ---- property: round trip over arbitrary keys and binary payloads
  test("property: deaggregate(aggregate(children)) == children") {
    val genChild = for {
      key <- Gen.alphaNumStr.suchThat(_.length <= 64)
      data <- Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (key, data)
    val genChildren = Gen.listOfN(10, genChild).flatMap(l => Gen.someOf(l)).map(_.toList)
    check(Prop.forAll(genChildren) { children =>
      val out = KplCodec.deaggregate(KplCodec.aggregate(children))
      out.map(_._1) == children.map(_._1) &&
        out.map(_._2.toSeq) == children.map(_._2.toSeq)
    })
  }

  test("property: random garbage after magic never crashes, at worst drops") {
    val genBytes = Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    check(Prop.forAll(genBytes) { garbage =>
      val rec = KplCodec.Magic ++ garbage
      KplCodec.deaggregate(rec) // must not throw
      true
    })
  }
}
