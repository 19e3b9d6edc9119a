package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Round-10 registry sweep #7 kernels. Every algorithm here is a
  * re-implementation of a PUBLISHED specification, cited at the method;
  * reference file:line pointers are provenance only.
  *
  * All methods are static-invoke targets (codegen-eligible, no row
  * UDFs). */
object SweepKernels7 {

  // ---- SipHash-2-4 (Aumasson & Bernstein, the published SipHash spec;
  // reference carrier: src/Common/SipHash.h) ---------------------------
  //
  // Three output modes, matching the reference surface:
  //  - 64-bit:       standard SipHash-2-4 (finalizer v2 ^= 0xff)
  //  - legacy 128:   the reference's historical sipHash128 — same rounds,
  //                  output (v0^v1, v2^v3), little-endian 16 bytes
  //  - reference 128: the official 128-bit variant from the SipHash spec
  //                  (v1 ^= 0xee at init, v2 ^= 0xee at finalize, second
  //                  squeeze with v1 ^= 0xdd)

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  private final class Sip(k0: Long, k1: Long, ref128: Boolean) {
    var v0: Long = 0x736f6d6570736575L ^ k0
    var v1: Long = 0x646f72616e646f6dL ^ k1
    var v2: Long = 0x6c7967656e657261L ^ k0
    var v3: Long = 0x7465646279746573L ^ k1
    if (ref128) v1 ^= 0xee
    def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }
    /** Absorb all input + the length-tagged last word, then the
      * finalizer xor and 4 rounds. */
    def absorbAndFinalize(data: Array[Byte]): Unit = {
      val n = data.length
      val full = n & ~7
      var i = 0
      while (i < full) {
        var w = 0L
        var j = 0
        while (j < 8) { w |= (data(i + j) & 0xffL) << (8 * j); j += 1 }
        v3 ^= w; round(); round(); v0 ^= w
        i += 8
      }
      var last = (n.toLong & 0xff) << 56
      var j = 0
      while (i + j < n) { last |= (data(i + j) & 0xffL) << (8 * j); j += 1 }
      v3 ^= last; round(); round(); v0 ^= last
      v2 ^= (if (ref128) 0xee else 0xff)
      round(); round(); round(); round()
    }
  }

  def sipHash64Keyed(k0: Long, k1: Long, data: Array[Byte]): Long = {
    val s = new Sip(k0, k1, ref128 = false)
    s.absorbAndFinalize(data)
    s.v0 ^ s.v1 ^ s.v2 ^ s.v3
  }

  /** The reference's sipHash64: SipHash-2-4 with the zero key. */
  def sipHash64(data: Array[Byte]): Long = sipHash64Keyed(0L, 0L, data)

  private def le16(lo: Long, hi: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) { out(i) = (lo >>> (8 * i)).toByte; i += 1 }
    while (i < 16) { out(i) = (hi >>> (8 * (i - 8))).toByte; i += 1 }
    out
  }

  /** Legacy sipHash128 (SipHash.h get128): (v0^v1, v2^v3) LE bytes. */
  def sipHash128Keyed(k0: Long, k1: Long, data: Array[Byte]): Array[Byte] = {
    val s = new Sip(k0, k1, ref128 = false)
    s.absorbAndFinalize(data)
    le16(s.v0 ^ s.v1, s.v2 ^ s.v3)
  }
  def sipHash128(data: Array[Byte]): Array[Byte] =
    sipHash128Keyed(0L, 0L, data)

  /** Official 128-bit SipHash (spec appendix; SipHash.cpp
    * get128Reference): lo = first squeeze, v1 ^= 0xdd, 4 rounds,
    * hi = second squeeze. */
  def sipHash128ReferenceKeyed(k0: Long, k1: Long,
      data: Array[Byte]): Array[Byte] = {
    val s = new Sip(k0, k1, ref128 = true)
    s.absorbAndFinalize(data)
    val lo = s.v0 ^ s.v1 ^ s.v2 ^ s.v3
    s.v1 ^= 0xdd
    s.round(); s.round(); s.round(); s.round()
    val hi = s.v0 ^ s.v1 ^ s.v2 ^ s.v3
    le16(lo, hi)
  }
  def sipHash128Reference(data: Array[Byte]): Array[Byte] =
    sipHash128ReferenceKeyed(0L, 0L, data)

  // ---- halfMD5 (FunctionsHashing.h:239): first 8 MD5-digest bytes read
  // as a BIG-endian UInt64 (returned as the signed bit pattern) --------
  def halfMd5(data: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(data)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  // ---- gccMurmurHash (FunctionsHashing.h:409): MurmurHash64A — the
  // published Appleby algorithm — with libstdc++'s seed 0xc70f6907 -----
  def gccMurmurHash(data: Array[Byte]): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    val seed = 0xc70f6907L
    var h = seed ^ (data.length * m)
    val full = data.length & ~7
    var i = 0
    while (i < full) {
      var k = 0L
      var j = 0
      while (j < 8) { k |= (data(i + j) & 0xffL) << (8 * j); j += 1 }
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    val rem = data.length & 7
    var j = rem - 1
    while (j >= 0) { h ^= (data(full + j) & 0xffL) << (8 * j); j -= 1 }
    if (rem > 0) h *= m
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  // ---- parseTimeDelta (parseTimeDelta.cpp): '1d 2h 3m 4s'-style text
  // to Float64 seconds; bare numbers are seconds ------------------------
  private val unitSeconds = Map(
    "ns" -> 1e-9, "nanosecond" -> 1e-9, "nanoseconds" -> 1e-9,
    "us" -> 1e-6, "microsecond" -> 1e-6, "microseconds" -> 1e-6,
    "ms" -> 1e-3, "millisecond" -> 1e-3, "milliseconds" -> 1e-3,
    "s" -> 1.0, "sec" -> 1.0, "secs" -> 1.0, "second" -> 1.0, "seconds" -> 1.0,
    "m" -> 60.0, "min" -> 60.0, "mins" -> 60.0, "minute" -> 60.0, "minutes" -> 60.0,
    "h" -> 3600.0, "hr" -> 3600.0, "hrs" -> 3600.0, "hour" -> 3600.0, "hours" -> 3600.0,
    "d" -> 86400.0, "day" -> 86400.0, "days" -> 86400.0,
    "w" -> 604800.0, "week" -> 604800.0, "weeks" -> 604800.0)

  def parseTimeDelta(s: UTF8String): Double = {
    val text = s.toString.trim.toLowerCase
    require(text.nonEmpty, "parseTimeDelta: empty input")
    val token = "([0-9]*\\.?[0-9]+)\\s*([a-z]*)".r
    var total = 0.0
    var matched = 0
    token.findAllMatchIn(text).foreach { m =>
      val v = m.group(1).toDouble
      val unit = m.group(2)
      val mult =
        if (unit.isEmpty) 1.0
        else unitSeconds.getOrElse(unit, throw new IllegalArgumentException(
          s"parseTimeDelta: unknown unit '$unit'"))
      total += v * mult
      matched += 1
    }
    require(matched > 0, s"parseTimeDelta: unparsable '$text'")
    total
  }

  // ---- string byte statistics (stringBytesEntropy.cpp /
  // stringBytesUniq.cpp): Shannon entropy / distinct count over the raw
  // byte histogram ------------------------------------------------------
  def stringBytesEntropy(data: Array[Byte]): Double = {
    if (data.isEmpty) return 0.0
    val counts = new Array[Int](256)
    data.foreach(b => counts(b & 0xff) += 1)
    val n = data.length.toDouble
    var h = 0.0
    var i = 0
    while (i < 256) {
      if (counts(i) > 0) {
        val p = counts(i) / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      i += 1
    }
    h
  }

  def stringBytesUniq(data: Array[Byte]): Long = {
    val seen = new Array[Boolean](256)
    var n = 0L
    data.foreach { b =>
      if (!seen(b & 0xff)) { seen(b & 0xff) = true; n += 1 }
    }
    n
  }

  // ---- toFixedString (FunctionsConversion.h toFixedString): pad with
  // NUL bytes to exactly n; longer input is an error ---------------------
  def toFixedString(s: UTF8String, n: Int): Array[Byte] = {
    val bytes = s.getBytes
    require(bytes.length <= n,
      s"String too long for type FixedString($n)")
    java.util.Arrays.copyOf(bytes, n)
  }
}
