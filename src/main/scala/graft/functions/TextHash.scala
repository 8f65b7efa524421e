package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM hash kernels for the LLM-pipeline operators, called from the
  * codegen'd Catalyst expressions `graft_minhash16` / `graft_simhash64`
  * ([[graft.plans.GraftExpressions]]).
  *
  * These exist for performance, not semantics: the equivalent pure-Column
  * formulations (nested `transform`/`aggregate` higher-order functions over
  * md5/substring/instr) are evaluated by Catalyst's INTERPRETED expression
  * path — lambda functions are excluded from whole-stage codegen — which
  * made SimHash ~14 s and MinHash ~6 s per bench run at sf0.1. The round-3
  * ScalaUDF variants fixed that, but still allocated a fresh
  * `MessageDigest.getInstance("MD5")` per hash call (a synchronized
  * provider lookup) and rendered an 8-char hex String per shingle×perm —
  * recorded at 9.7 s for q41 in BENCH_r03. This version:
  *
  *  - reuses a thread-local digest + 16-byte output buffer (zero per-call
  *    allocation beyond the shingle bytes themselves);
  *  - tracks each MinHash lane as an unsigned 32-bit value in a long and
  *    renders hex ONCE per signature element at the end — fixed-width
  *    lowercase hex means string min == unsigned numeric min of the first
  *    32 digest bits, so the output is bit-identical;
  *  - takes the raw text and tokenizes/shingles inline (`split(" ", -1)`
  *    matches Spark `split(text, ' ')` and DuckDB `string_split`), so the
  *    interpreted shingle-building HOF disappears from the plan.
  *
  * Output parity is asserted by the unchanged DuckDB oracles of q41–q43,
  * q67 and q83. Each kernel documents the exact arithmetic contract its
  * SQL oracle mirrors.
  */
object TextHash {

  private val md5Tl: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val bufTl: ThreadLocal[Array[Byte]] = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** `"<i>:"` prefix bytes for the 16 md5-keyed hash family members. */
  private val permPrefix: Array[Array[Byte]] =
    Array.tabulate(16)(i => (i.toString + ":").getBytes(StandardCharsets.US_ASCII))

  private val hexDigits = "0123456789abcdef".getBytes(StandardCharsets.US_ASCII)

  /** First 32 digest bits (big-endian) as 8 lowercase hex chars — equals
    * `substr(md5(x), 1, 8)`.
    */
  private def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var j = 0
    while (j < 8) { cs(j) = hexDigits(((v >>> (28 - 4 * j)) & 0xF).toInt); j += 1 }
    UTF8String.fromBytes(cs)
  }

  /** 16-permutation MinHash signature over the text's 3-token shingles:
    * `sig(i) = min over shingles of substr(md5(i ++ ":" ++ shingle), 1, 8)`
    * where shingle k is `tok(k) ++ " " ++ tok(k+1) ++ " " ++ tok(k+2)`.
    * Oracle contract (q41): `list_aggregate([substr(md5(i || ':' || s), 1,
    * 8) for s in sh], 'min') for i in range(0, 16)` over the string_split
    * shingle list. Fewer than 3 tokens → all 16 lanes NULL (DuckDB
    * `list_aggregate([], 'min')` is NULL too).
    */
  def minhashArray(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val nSh = toks.length - 2
    val out = new Array[AnyRef](16)
    if (nSh > 0) {
      val md = md5Tl.get()
      val buf = bufTl.get()
      val mins = new Array[Long](16)
      java.util.Arrays.fill(mins, Long.MaxValue)
      var k = 0
      while (k < nSh) {
        val shingle = new java.lang.StringBuilder(toks(k))
          .append(' ').append(toks(k + 1)).append(' ').append(toks(k + 2)).toString
        val sBytes = shingle.getBytes(StandardCharsets.UTF_8)
        var i = 0
        while (i < 16) {
          md.reset()
          md.update(permPrefix(i))
          md.update(sBytes)
          md.digest(buf, 0, 16)
          val v = ((buf(0) & 0xFFL) << 24) | ((buf(1) & 0xFF) << 16) |
            ((buf(2) & 0xFF) << 8) | (buf(3) & 0xFF)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        k += 1
      }
      var i = 0
      while (i < 16) { out(i) = hex8(mins(i)); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over the text's whitespace tokens, as a '0'/'1' bit
    * string: bit b is 1 iff the majority of token md5s have bit b set
    * (ties → 1), where bit b is the b-th bit of the big-endian first 8
    * digest bytes. Oracle contract (q43/q67): the strpos/substr/shift
    * formulation over md5 hex — identical bit extraction, since hex char
    * `1 + b/4` holds digest bits `4*(b/4) .. 4*(b/4)+3`.
    */
  def simhashBits(text: UTF8String): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val md = md5Tl.get()
    val buf = bufTl.get()
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      md.reset()
      md.update(toks(t).getBytes(StandardCharsets.UTF_8))
      md.digest(buf, 0, 16)
      var b = 0
      while (b < 64) {
        if (((buf(b >> 3) >> (7 - (b & 7))) & 1) == 1) counts(b) += 1
        else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    val bits = new Array[Byte](64)
    var b = 0
    while (b < 64) { bits(b) = if (counts(b) >= 0) '1' else '0'; b += 1 }
    UTF8String.fromBytes(bits)
  }

  /** DISTINCT n-token shingles of the text (first-occurrence order, same
    * as Spark's `array_distinct` over the transform-built list): shingle k
    * is `tok(k) .. tok(k+n-1)` joined by single spaces. The set semantics
    * make evaluation order irrelevant to every consumer (intersections,
    * mins, joins), so the oracle keeps its list-comprehension +
    * list_distinct SQL. Kernel-side because the equivalent
    * `transform(sequence(...), i -> concat_ws(...))` HOF lambda is
    * interpreted — q92's two shingle passes cost 11.7 s at sf0.1 through
    * the interpreter vs well under a second here.
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[AnyRef])
    else {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var k = 0
      while (k < count) {
        val sb = new java.lang.StringBuilder(toks(k))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(k + j)); j += 1 }
        seen.add(sb.toString)
        k += 1
      }
      val out = new Array[AnyRef](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
  }

  /** q118's per-doc gram statistics in ONE token pass: (n2, top2, n5, d5)
    * = (bigram occurrences, max single-bigram multiplicity, 5-gram
    * occurrences, distinct 5-grams), over whitespace tokens with the same
    * split semantics as Spark `split(text, ' ')` / DuckDB string_split
    * (empty tokens from doubled spaces are REAL tokens on both engines,
    * so they are real here too). Exact string-keyed counting — no hash
    * collision channel — in tight JVM maps; returns null for docs under
    * 5 tokens (no 5-gram stream; the fractions would be degenerate).
    * Replaces an interpreted array_sort + aggregate-HOF chain that paid
    * per-ELEMENT virtual-call overhead; this is one virtual call per ROW.
    */
  def gramStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toString.split(" ", -1)
    val L = toks.length
    if (L < 5) return null
    val big = new java.util.HashMap[String, Int](L * 2)
    var top2 = 0L
    var i = 0
    while (i < L - 1) {
      val key = toks(i) + " " + toks(i + 1)
      val c = big.merge(key, 1, (a, b) => a + b)
      if (c > top2) top2 = c
      i += 1
    }
    val five = new java.util.HashSet[String](L * 2)
    i = 0
    while (i < L - 4) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < 5) { sb.append(' ').append(toks(i + j)); j += 1 }
      five.add(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((L - 1).toLong, top2, (L - 4).toLong, five.size.toLong))
  }

  /** Hamming distance between two equal-length bit strings ('0'/'1' chars)
    * — counts differing positions; the oracle mirror is a per-position
    * substr compare sum. Runs only on candidate pairs (post-bucket-join),
    * so a plain UDF is fine here.
    */
  val hammingBits: UserDefinedFunction = udf { (a: String, b: String) =>
    var d = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }
}
