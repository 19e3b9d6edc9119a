package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** toIPv6 conversion family + the 128/256-bit reinterpret lanes.
  *
  * toIPv6[OrNull|OrZero|OrDefault] (reference
  * src/Functions/FunctionsConversion.cpp IPv6 lanes): parse an IPv6
  * text — IPv4 text maps to ::ffff:a.b.c.d — onto the engine's IPv6
  * carrier (the RFC 5952 canonical string ipv6NumToString emits).
  * Parsing is guava's InetAddresses (DNS-free by contract — never a
  * resolver call, unlike InetAddress.getByName); invalid input throws /
  * NULL / '::' / the default per the four spellings.
  *
  * reinterpretAs{Int,UInt}{128,256} (reinterpretAs.cpp): the raw
  * LITTLE-ENDIAN byte image of the argument, zero-padded to 16/32
  * bytes, read as a (two's-complement | unsigned) integer on the
  * wide-int decimal-string carrier — the same carrier the wide-int
  * arithmetic family uses. */
object Ipv6CastKernels {

  private def canonical(s: String): String = {
    if (!com.google.common.net.InetAddresses.isInetAddress(s)) return null
    com.google.common.net.InetAddresses.forString(s) match {
      case v4: java.net.Inet4Address => "::ffff:" + v4.getHostAddress
      case v6 => com.google.common.net.InetAddresses.toAddrString(v6)
    }
  }

  def toIpv6(s: UTF8String): UTF8String = {
    val c = canonical(s.toString)
    if (c == null) throw new IllegalArgumentException(
      s"toIPv6: invalid IPv6 value '$s'")
    UTF8String.fromString(c)
  }

  def toIpv6OrNull(s: UTF8String): UTF8String =
    if (s == null) null
    else Option(canonical(s.toString)).map(UTF8String.fromString).orNull

  def toIpv6OrZero(s: UTF8String): UTF8String =
    Option(if (s == null) null else canonical(s.toString))
      .map(UTF8String.fromString)
      .getOrElse(UTF8String.fromString("::"))

  def toIpv6OrDefault(s: UTF8String, dflt: UTF8String): UTF8String = {
    val first = if (s == null) null else canonical(s.toString)
    if (first != null) UTF8String.fromString(first)
    else toIpv6(dflt) // the default itself must be valid (loud otherwise)
  }

  /** LE byte image, zero-padded/truncated to `width` bytes, as a
    * decimal string on the wide-int carrier. */
  def reinterpretWide(data: Array[Byte], width: Int,
      signed: Boolean): UTF8String = {
    val buf = new Array[Byte](width)
    val n = math.min(if (data == null) 0 else data.length, width)
    var i = 0
    while (i < n) { buf(i) = data(i); i += 1 }
    // BigInteger is big-endian: reverse the LE image
    val be = new Array[Byte](width)
    i = 0
    while (i < width) { be(i) = buf(width - 1 - i); i += 1 }
    val v = if (signed) new java.math.BigInteger(be)
      else new java.math.BigInteger(1, be)
    UTF8String.fromString(v.toString)
  }
}
