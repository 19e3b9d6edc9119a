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
}
