package graft

import graft.operators.Multimodal.{BlobCodec, FakeDecoder}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Blob container codec + fake decoder determinism. */
class MultimodalSpec extends AnyFunSuite {

  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("blob header round trip") {
    val blob = BlobCodec.encode(640, 480, 3, b("payload"))
    val m = BlobCodec.decodeMeta(blob)
    assert(m == BlobCodec.Meta("GFT0", 640, 480, 3, 7))
  }

  test("16-bit dimensions survive the byte split") {
    val m = BlobCodec.decodeMeta(BlobCodec.encode(65535, 257, 255, Array.emptyByteArray))
    assert(m.width == 65535 && m.height == 257 && m.channels == 255 && m.payload_len == 0)
  }

  test("foreign or truncated blobs decode to null (drop posture)") {
    assert(BlobCodec.decodeMeta(b("JPEG not ours")) == null)
    assert(BlobCodec.decodeMeta(b("GFT")) == null)
    assert(BlobCodec.decodeMeta(null) == null)
  }

  test("fake features are deterministic, dim-sized, in [0,1]") {
    val f1 = FakeDecoder.features(b("same payload"), 8)
    val f2 = FakeDecoder.features(b("same payload"), 8)
    assert(f1 == f2)
    assert(f1.size == 8)
    assert(f1.forall(x => x >= 0.0 && x <= 1.0))
    assert(FakeDecoder.features(b("other payload"), 8) != f1)
  }
}
