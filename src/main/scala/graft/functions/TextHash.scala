package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** JVM hash kernels for the LLM-pipeline operators.
  *
  * These exist for performance, not semantics: the equivalent pure-Column
  * formulations (nested `transform`/`aggregate` higher-order functions over
  * md5/substring/instr) are evaluated by Catalyst's INTERPRETED expression
  * path — lambda functions are excluded from whole-stage codegen — which
  * made SimHash ~14 s and MinHash ~6 s per bench run at sf0.1. A tight JVM
  * loop over MessageDigest is 10-100× faster and produces bit-identical
  * output (asserted by the unchanged DuckDB oracles of q41–q43).
  *
  * Each function documents the exact arithmetic contract its SQL oracle
  * mirrors.
  */
object TextHash {

  private def md5(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))

  private val hexDigits = "0123456789abcdef".toCharArray

  /** First 4 digest bytes as 8 lowercase hex chars — equals
    * `substring(md5(x), 1, 8)`; fixed-width lowercase hex, so string order
    * equals numeric order of the first 32 hash bits.
    */
  private def hex8(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(8)
    var i = 0
    while (i < 4) {
      sb.append(hexDigits((d(i) >> 4) & 0xF)).append(hexDigits(d(i) & 0xF))
      i += 1
    }
    sb.toString
  }

  /** 16-permutation MinHash signature:
    * `sig(i) = min over shingles of hex8(md5(i ++ ":" ++ shingle))`.
    * Oracle contract: `list_aggregate([substr(md5(i || ':' || s), 1, 8)
    * for s in sh], 'min') for i in range(0,16)`.
    */
  val minhash16: UserDefinedFunction = udf { (shingles: Seq[String]) =>
    if (shingles == null) null
    else (0 until 16).map { i =>
      var min: String = null
      shingles.foreach { s =>
        val h = hex8(md5(i.toString + ":" + s))
        if (min == null || h.compareTo(min) < 0) min = h
      }
      min
    }
  }

  /** 64-bit SimHash as a bit string: bit b is 1 iff the majority of token
    * md5s have bit b set (ties → 1), where bit b is the b-th bit of the
    * big-endian first 8 digest bytes. Oracle contract: the
    * strpos/substr/shift formulation over md5 hex in q43's SQL — identical
    * bit extraction, since hex char `1 + b/4` holds digest bits
    * `4*(b/4) .. 4*(b/4)+3`.
    */
  val simhash64: UserDefinedFunction = udf { (tokens: Seq[String]) =>
    if (tokens == null) null
    else {
      val counts = new Array[Int](64)
      tokens.foreach { t =>
        val d = md5(t)
        var b = 0
        while (b < 64) {
          if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) counts(b) += 1
          else counts(b) -= 1
          b += 1
        }
      }
      val sb = new java.lang.StringBuilder(64)
      counts.foreach(c => sb.append(if (c >= 0) '1' else '0'))
      sb.toString
    }
  }

  /** Hamming distance between two equal-length bit strings ('0'/'1' chars)
    * — counts differing positions; the oracle mirror is a per-position
    * substr compare sum.
    */
  val hammingBits: UserDefinedFunction = udf { (a: String, b: String) =>
    var d = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  /** Ascending-index double dot product — the same left-to-right summation
    * order as DuckDB's `list_dot_product` and Spark's
    * `aggregate(zip_with(...))` fold, so results are bit-identical.
    */
  val dotProduct: UserDefinedFunction = udf { (a: Seq[Double], b: Seq[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
