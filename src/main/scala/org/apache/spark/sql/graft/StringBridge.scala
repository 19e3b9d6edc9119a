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
