package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Round-10 sweep #8 kernels. */
object SweepKernels8 {

  /** roundDown (roundDown.cpp): largest boundary ≤ x; below every
    * boundary → the smallest boundary (the reference's saturation). */
  def roundDown(x: Double,
      bounds: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val bs = bounds.toDoubleArray().sorted
    require(bs.nonEmpty, "roundDown: empty boundary array")
    var best = bs(0)
    var i = 0
    while (i < bs.length && bs(i) <= x) { best = bs(i); i += 1 }
    best
  }

  /** generateSerialID (generateSerialID.cpp — a Keeper-backed named
    * counter): the single-node mapping is a process-wide monotonic
    * counter per name. */
  private val serials =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
  def generateSerialId(name: UTF8String): Long =
    serials.computeIfAbsent(name.toString,
      _ => new java.util.concurrent.atomic.AtomicLong(0L))
      .getAndIncrement()

  /** convertCharset (FunctionsCharset.cpp): re-decode the raw bytes
    * from one named charset and return the text (Java's codec set —
    * the same iconv surface). */
  def convertCharset(data: Array[Byte], from: UTF8String,
      to: UTF8String): UTF8String = {
    val decoded = new String(data, java.nio.charset.Charset.forName(from.toString))
    // encode to the target charset, then read back as that charset's
    // bytes — the engine's string carrier is UTF-8, so the returned
    // TEXT is the faithful content; byte-level round-trips go through
    // the binary type
    val encoded = decoded.getBytes(java.nio.charset.Charset.forName(to.toString))
    UTF8String.fromString(
      new String(encoded, java.nio.charset.Charset.forName(to.toString)))
  }

  /** randomStringUTF8(n): n random Unicode code points (letters from
    * the BMP, surrogate-free — the printable contract the reference
    * documents). Nondeterministic by design. */
  def randomStringUtf8(n: Int): UTF8String = {
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      var cp = 0
      do cp = 0x20 + rnd.nextInt(0xD7FF - 0x20)
      while (Character.isISOControl(cp))
      sb.appendCodePoint(cp)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** reinterpretAsUUID (reinterpretAs.cpp UUID lane): the first 16
    * little-endian bytes (zero-padded) render as
    * reverse(b[0..7]) ++ reverse(b[8..15]) — pinned on the reference
    * docs example. */
  def reinterpretAsUuid(data: Array[Byte]): UTF8String = {
    val b = java.util.Arrays.copyOf(data, 16)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) { out(i) = b(7 - i); out(8 + i) = b(15 - i); i += 1 }
    val hex = out.map(x => f"${x & 0xff}%02x").mkString
    UTF8String.fromString(
      s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
        s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
        s"${hex.substring(20)}")
  }
}
