package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, MathContext, RoundingMode}

import org.apache.spark.unsafe.types.UTF8String

/** Exact wide-integer arithmetic kernels for the Int128 / UInt128 /
  * Int256 / UInt256 surface the reference implements natively
  * (src/DataTypes/DataTypesNumber.cpp, src/Functions/FunctionBinaryArithmetic.h).
  *
  * Spark's widest exact numeric is DECIMAL(38) (~9.99e37), which cannot
  * carry a full Int128 (±1.7e38) let alone Int256. This engine carries
  * wide integers as CANONICAL DECIMAL STRINGS and evaluates the
  * reference's named arithmetic functions (plus/minus/multiply/intDiv/
  * modulo/negate/gcd/lcm, src/Functions/plus.cpp etc.) exactly via
  * BigInteger/BigDecimal. Width is applied at the conversion boundary —
  * toInt128(...) wraps its argument into the signed 128-bit range the way
  * the reference's static type system applies the result type to an
  * expression tree (C++ wraparound semantics, two's complement).
  *
  * All methods are static (Scala object forwarders) and invoked from the
  * SQL registry via StaticInvoke, so whole-stage codegen inlines the call.
  * Inputs arrive as UTF8String (post-Cast to STRING); unparseable input
  * returns NULL (engine-wide stance: the reference's throw-on-bad-input
  * forms are rendered as their OrNull twins).
  *
  * Rendering is DuckDB-compatible: integers print with no exponent, no
  * leading zeros, '-' sign only; non-integral results (plus/minus/multiply
  * on fractional inputs) print as plain scale-trimmed decimals. That makes
  * the whole surface exactly oracle-able against DuckDB HUGEINT/DECIMAL
  * arithmetic rendered with CAST(x AS VARCHAR).
  */
object WideIntKernels {

  private val MC = MathContext.DECIMAL128

  private def parse(s: UTF8String): JBigDecimal = {
    if (s == null) return null
    try new JBigDecimal(s.toString.trim)
    catch { case _: NumberFormatException => null }
  }

  /** Canonical rendering: integral values as plain integers, fractional
    * values with trailing zeros stripped (1.50 -> "1.5"). */
  private def render(v: JBigDecimal): UTF8String = {
    if (v == null) return null
    val stripped = v.stripTrailingZeros
    val plain =
      if (stripped.scale <= 0) stripped.setScale(0).toBigInteger.toString
      else stripped.toPlainString
    UTF8String.fromString(plain)
  }

  private def renderInt(v: BigInteger): UTF8String =
    if (v == null) null else UTF8String.fromString(v.toString)

  /** Wrap an arbitrary integer into an N-bit two's-complement lane
    * (signed = [-2^(n-1), 2^(n-1)), unsigned = [0, 2^n)) — C++
    * static_cast semantics the reference inherits for overflow. */
  private def wrap(v: BigInteger, bits: Int, signed: Boolean): BigInteger = {
    val m = BigInteger.ONE.shiftLeft(bits)
    var r = v.mod(m) // non-negative
    if (signed && r.testBit(bits - 1)) r = r.subtract(m)
    r
  }

  /** toInt128 / toUInt128 / toInt256 / toUInt256: truncate any fractional
    * part (float->int reference conversion truncates toward zero), then
    * wrap to width. NULL on parse failure. */
  def toWide(s: UTF8String, bits: Int, signed: Boolean): UTF8String = {
    val d = parse(s)
    if (d == null) return null
    val i = d.setScale(0, RoundingMode.DOWN).toBigInteger
    renderInt(wrap(i, bits, signed))
  }

  /** OrNull twins: NULL (instead of wrapping) when the value is outside
    * the target range — accurateCastOrNull semantics
    * (src/Functions/FunctionsConversion.h). */
  def toWideOrNull(s: UTF8String, bits: Int, signed: Boolean): UTF8String = {
    val d = parse(s)
    if (d == null) return null
    val i = d.setScale(0, RoundingMode.DOWN).toBigInteger
    val lo = if (signed) BigInteger.ONE.shiftLeft(bits - 1).negate else BigInteger.ZERO
    val hi = BigInteger.ONE.shiftLeft(if (signed) bits - 1 else bits)
    if (i.compareTo(lo) < 0 || i.compareTo(hi) >= 0) null
    else renderInt(i)
  }

  // ---- arithmetic (exact, arbitrary precision) ------------------------

  def plus(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) null else render(x.add(y))
  }

  def minus(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) null else render(x.subtract(y))
  }

  def multiply(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) null else render(x.multiply(y))
  }

  /** intDiv: truncated integer division (reference intDiv truncates
    * toward zero). NULL on division by zero (intDivOrZero returns 0). */
  def intDiv(a: UTF8String, b: UTF8String, orZero: Boolean): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    if (y.signum == 0)
      return if (orZero) UTF8String.fromString("0") else null
    val xi = x.setScale(0, RoundingMode.DOWN).toBigInteger
    val yi = y.setScale(0, RoundingMode.DOWN).toBigInteger
    if (yi.signum == 0)
      return if (orZero) UTF8String.fromString("0") else null
    renderInt(xi.divide(yi))
  }

  /** modulo: C++ % semantics — sign follows the dividend. */
  def modulo(a: UTF8String, b: UTF8String, orZero: Boolean): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    val xi = x.setScale(0, RoundingMode.DOWN).toBigInteger
    val yi = y.setScale(0, RoundingMode.DOWN).toBigInteger
    if (yi.signum == 0)
      return if (orZero) UTF8String.fromString("0") else null
    renderInt(xi.remainder(yi))
  }

  def negate(a: UTF8String): UTF8String = {
    val x = parse(a)
    if (x == null) null else render(x.negate)
  }

  def gcd(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    val xi = x.setScale(0, RoundingMode.DOWN).toBigInteger
    val yi = y.setScale(0, RoundingMode.DOWN).toBigInteger
    renderInt(xi.gcd(yi))
  }

  def lcm(a: UTF8String, b: UTF8String): UTF8String = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    val xi = x.setScale(0, RoundingMode.DOWN).toBigInteger.abs
    val yi = y.setScale(0, RoundingMode.DOWN).toBigInteger.abs
    if (xi.signum == 0 || yi.signum == 0) return UTF8String.fromString("0")
    renderInt(xi.divide(xi.gcd(yi)).multiply(yi))
  }

  /** divide: the reference's `divide` is floating division whatever the
    * integer widths — evaluate exactly then round to double. */
  def divide(a: UTF8String, b: UTF8String): java.lang.Double = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return null
    if (y.signum == 0) return null
    java.lang.Double.valueOf(x.divide(y, MC).doubleValue)
  }

  /** Comparison kernel: -1/0/1. Numeric (exact, any width) when both
    * sides parse as numbers; binary string collation otherwise — the
    * reference's generic comparison dispatch. Inputs are non-null
    * (StaticInvoke propagates SQL NULLs before the call). */
  def cmp(a: UTF8String, b: UTF8String): Int = {
    val x = parse(a); val y = parse(b)
    if (x != null && y != null) x.compareTo(y)
    else a.compareTo(b)
  }
}
