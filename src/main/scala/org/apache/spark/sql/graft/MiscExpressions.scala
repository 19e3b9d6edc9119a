package org.apache.spark.sql.graft

import java.util.concurrent.ThreadLocalRandom
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-7 registry-tail expressions re-implemented from PUBLIC specs —
  * base58 (Bitcoin alphabet), base32 (RFC 4648), geohash (public
  * algorithm), ULID (Crockford base32 spec), UUIDv7 (RFC 9562) and a
  * snowflake-layout id generator. Interpreted eval (CodegenFallback):
  * these are registry-tail conveniences, not hot-path kernels — none sits
  * inside a scan/join/agg loop the way ArrayDotProduct does.
  */
object MiscCodecs {

  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    B58.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Bitcoin-alphabet base58 of arbitrary bytes (public scheme; the
    * reference's base58Encode.cpp implements the same published codec). */
  def base58Encode(in: Array[Byte]): String = {
    val zeros = in.takeWhile(_ == 0).length
    var num = BigInt(1, in)
    val sb = new StringBuilder
    while (num > 0) {
      val (q, r) = num /% 58
      sb.append(B58(r.toInt)); num = q
    }
    ("1" * zeros) + sb.reverseInPlace().toString
  }

  def base58Decode(s: String): Array[Byte] = {
    val zeros = s.takeWhile(_ == '1').length
    var num = BigInt(0)
    s.foreach { c =>
      val v = if (c < 128) B58Idx(c.toInt) else -1
      require(v >= 0, s"base58Decode: invalid character '$c'")
      num = num * 58 + v
    }
    val body = num.toByteArray.dropWhile(_ == 0)
    Array.fill[Byte](zeros)(0) ++ body
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 with padding. */
  def base32Encode(in: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    in.foreach { b =>
      buffer = (buffer << 8) | (b & 0xff); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(B32(((buffer >> bits) & 31).toInt)) }
    }
    if (bits > 0) sb.append(B32(((buffer << (5 - bits)) & 31).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    val clean = s.toUpperCase.takeWhile(_ != '=')
    var buffer = 0L
    var bits = 0
    val out = Array.newBuilder[Byte]
    clean.foreach { c =>
      val v = B32.indexOf(c)
      require(v >= 0, s"base32Decode: invalid character '$c'")
      buffer = (buffer << 5) | v; bits += 5
      if (bits >= 8) { bits -= 8; out += ((buffer >> bits) & 0xff).toByte }
    }
    out.result()
  }

  private val GEO = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Public geohash algorithm: interleave longitude/latitude bisections,
    * 5 bits per character. */
  def geohashEncode(lon: Double, lat: Double, precision: Int): String = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    val sb = new StringBuilder
    var even = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(GEO(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Cell-center decode — (longitude, latitude). */
  def geohashDecode(h: String): (Double, Double) = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var even = true
    h.toLowerCase.foreach { c =>
      val v = GEO.indexOf(c)
      require(v >= 0, s"geohashDecode: invalid character '$c'")
      (4 to 0 by -1).foreach { b =>
        val bitSet = ((v >> b) & 1) == 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bitSet) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bitSet) latLo = mid else latHi = mid
        }
        even = !even
      }
    }
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }

  private val CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** ULID per the public spec: 48-bit ms timestamp + 80 random bits,
    * Crockford base32, 26 chars. */
  def ulid(): String = {
    val ms = System.currentTimeMillis()
    val r = ThreadLocalRandom.current()
    val hi = r.nextLong()
    val lo = r.nextLong()
    val sb = new StringBuilder(26)
    (9 to 0 by -1).foreach(i => sb.append(CROCKFORD(((ms >>> (i * 5)) & 31).toInt)))
    // 80 random bits: 16 chars of 5 bits from (hi:64 ++ lo:16)
    (15 to 0 by -1).foreach { i =>
      val bitPos = i * 5
      val v =
        if (bitPos >= 16) ((hi >>> (bitPos - 16)) & 31).toInt
        else (((hi << (16 - bitPos)) | (lo >>> (48 + bitPos))) & 31).toInt
      sb.append(CROCKFORD(v))
    }
    sb.toString
  }

  /** UUIDv7 per RFC 9562: 48-bit unix ms, version 7, variant 10,
    * 74 random bits; canonical dashed-hex text. */
  def uuidV7(): String = {
    val ms = System.currentTimeMillis()
    val r = ThreadLocalRandom.current()
    val hi = (ms << 16) | 0x7000L | (r.nextLong() & 0x0fffL)
    val lo = (r.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    f"${(hi >>> 32) & 0xffffffffL}%08x-${(hi >>> 16) & 0xffffL}%04x-" +
      f"${hi & 0xffffL}%04x-${(lo >>> 48) & 0xffffL}%04x-${lo & 0xffffffffffffL}%012x"
  }

  private val machineId: Long =
    (java.net.InetAddress.getLocalHost.getHostName.hashCode & 0x3ff).toLong
  private val counter = new AtomicLong()

  /** Snowflake-layout id (the reference's generateSnowflakeID):
    * ms-timestamp << 22 | 10-bit machine | 12-bit sequence. */
  def snowflakeId(): Long =
    (System.currentTimeMillis() << 22) | (machineId << 12) |
      (counter.getAndIncrement() & 0xfffL)
}

// ---------------------------------------------------------------- exprs

private[graft] object NumArg {
  def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  def toInt(v: Any): Int = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toInt
    case n: Number => n.intValue()
  }
}

case class Base58Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(MiscCodecs.base58Encode(
      v.asInstanceOf[UTF8String].getBytes))
  override protected def withNewChildInternal(c: Expression): Base58Encode =
    copy(child = c)
}

case class Base58Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(MiscCodecs.base58Decode(
      v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Base58Decode =
    copy(child = c)
}

case class Base32Encode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(MiscCodecs.base32Encode(
      v.asInstanceOf[UTF8String].getBytes))
  override protected def withNewChildInternal(c: Expression): Base32Encode =
    copy(child = c)
}

case class Base32Decode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(MiscCodecs.base32Decode(
      v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Base32Decode =
    copy(child = c)
}

case class GeohashEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(lon: Any, lat: Any, p: Any): Any =
    UTF8String.fromString(MiscCodecs.geohashEncode(
      NumArg.toDouble(lon), NumArg.toDouble(lat), NumArg.toInt(p)))
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): GeohashEncode = copy(first = f, second = s, third = t)
}

/** Decodes to struct(longitude, latitude) — the reference returns the
  * same tuple shape. */
case class GeohashDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any = {
    val (lon, lat) = MiscCodecs.geohashDecode(v.asInstanceOf[UTF8String].toString)
    InternalRow(lon, lat)
  }
  override protected def withNewChildInternal(c: Expression): GeohashDecode =
    copy(child = c)
}

abstract class NondetGenerator extends LeafExpression with CodegenFallback {
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false
}

case class GenerateULID() extends NondetGenerator {
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any =
    UTF8String.fromString(MiscCodecs.ulid())
}

case class GenerateUUIDv7() extends NondetGenerator {
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any =
    UTF8String.fromString(MiscCodecs.uuidV7())
}

case class GenerateSnowflakeID() extends NondetGenerator {
  override def dataType: DataType = LongType
  override def eval(input: InternalRow): Any = MiscCodecs.snowflakeId()
}

/** geohashesInBox(lonMin, latMin, lonMax, latMax, precision) — the
  * cover-set of geohash cells intersecting a box (array of strings,
  * capped like the reference at a sane cell count). */
case class GeohashesInBox(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return new GenericArrayData(Array.empty[Any])
    val Seq(lonMin, latMin, lonMax, latMax) = vs.take(4).map(NumArg.toDouble)
    val p = NumArg.toInt(vs(4))
    // enumerate GRID-ALIGNED cells intersecting the box (encoding the
    // center of each cell) — a corner-anchored walk can step over cells
    // whose boundaries don't align with the box corner
    val cells = scala.collection.mutable.LinkedHashSet.empty[String]
    val lonStep = 360.0 / (1L << ((5 * p + 1) / 2))
    val latStep = 180.0 / (1L << ((5 * p) / 2))
    val li0 = math.floor((lonMin + 180.0) / lonStep).toLong
    val li1 = math.floor((lonMax + 180.0) / lonStep).toLong
    val ti0 = math.floor((latMin + 90.0) / latStep).toLong
    val ti1 = math.floor((latMax + 90.0) / latStep).toLong
    var li = li0
    while (li <= li1 && cells.size < 10000) {
      var ti = ti0
      while (ti <= ti1 && cells.size < 10000) {
        cells += MiscCodecs.geohashEncode(
          -180.0 + (li + 0.5) * lonStep, -90.0 + (ti + 0.5) * latStep, p)
        ti += 1
      }
      li += 1
    }
    new GenericArrayData(cells.toArray.map(s =>
      UTF8String.fromString(s).asInstanceOf[Any]))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeohashesInBox =
    copy(children = newChildren)
}

/** 2-D Hilbert-curve encode (reference hilbertEncode.cpp; the classic
  * xy2d algorithm from the public Hilbert-curve literature): interleaves
  * with locality better than Morton — adjacent d values are always
  * adjacent cells. 31-bit coordinates. */
case class HilbertEncode2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Number].longValue()
    var y = b.asInstanceOf[Number].longValue()
    var rx = 0L
    var ry = 0L
    var d = 0L
    var s = 1L << 30
    while (s > 0) {
      rx = if ((x & s) > 0) 1L else 0L
      ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate quadrant
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : HilbertEncode2 = copy(left = l, right = r)
}

/** 2-D Hilbert decode (hilbertDecode.cpp; d2xy) → struct(x, y). */
case class HilbertDecode2(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any = {
    var t = v.asInstanceOf[Number].longValue()
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << 31)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    InternalRow(x, y)
  }
  override protected def withNewChildInternal(c: Expression): HilbertDecode2 =
    copy(child = c)
}

/** Solve the normal equations assembled from aggregated sufficient
  * statistics — the finalization step of this engine's
  * stochasticLinearRegression rendering (reference
  * AggregateFunctionMLMethod.cpp runs SGD; sufficient statistics +
  * closed-form ridge solve give the same least-squares answer
  * ORDER-INDEPENDENTLY, which distributed merges need). Input: flat
  * array of the (k+1)² Gram entries (intercept-augmented, row-major)
  * followed by the k+1 right-hand-side sums. Output: [w1..wk, bias]
  * (the reference's weights-then-bias layout). */
case class SolveLinearSystem(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    val m = arr.length
    val n = ((-1.0 + math.sqrt(1.0 + 4.0 * m)) / 2.0).round.toInt
    require(n * n + n == m, s"bad sufficient-statistics arity $m")
    val a = Array.tabulate(n, n)((i, j) => arr(i * n + j))
    val b = Array.tabulate(n)(i => arr(n * n + i))
    // tiny ridge for numerical stability on collinear inputs
    var i = 0
    while (i < n) { a(i)(i) += 1e-9; i += 1 }
    // Gaussian elimination with partial pivoting
    i = 0
    while (i < n) {
      var p = i
      var j = i + 1
      while (j < n) { if (math.abs(a(j)(i)) > math.abs(a(p)(i))) p = j; j += 1 }
      val tmpR = a(i); a(i) = a(p); a(p) = tmpR
      val tmpB = b(i); b(i) = b(p); b(p) = tmpB
      val piv = a(i)(i)
      j = i + 1
      while (j < n) {
        val f = a(j)(i) / piv
        var c = i
        while (c < n) { a(j)(c) -= f * a(i)(c); c += 1 }
        b(j) -= f * b(i)
        j += 1
      }
      i += 1
    }
    val w = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = b(i)
      var c = i + 1
      while (c < n) { s -= a(i)(c) * w(c); c += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    // internal order: [bias, w1..wk] → reference layout [w1..wk, bias]
    new GenericArrayData((w.drop(1) :+ w(0)).map(_.asInstanceOf[Any]))
  }
  override protected def withNewChildInternal(c: Expression): SolveLinearSystem =
    copy(child = c)
}
