package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reinterpretAs* family (reference src/Functions/reinterpretAs.cpp):
  * reinterpret a value's RAW little-endian byte image as another type —
  * never a numeric conversion. Strings/FixedStrings contribute their
  * bytes (zero-padded / truncated to the target width); numeric inputs
  * contribute the LE bytes of their binary representation.
  *
  * Dispatch on the child's type happens at eval (the input type is only
  * known after analysis); this family is interpreter-only
  * (CodegenFallback) — it is a diagnostic/codec surface, not a hot
  * path. */
object ReinterpretBytes {
  /** LE byte image of any supported input value. */
  def leBytes(value: Any, dt: DataType): Array[Byte] = dt match {
    case StringType => value.asInstanceOf[UTF8String].getBytes
    case BinaryType => value.asInstanceOf[Array[Byte]]
    case ByteType => Array(value.asInstanceOf[Byte])
    case ShortType =>
      val v = value.asInstanceOf[Short]
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    case IntegerType | DateType =>
      val v = value.asInstanceOf[Int]
      Array.tabulate[Byte](4)(i => ((v >> (8 * i)) & 0xff).toByte)
    case LongType | TimestampType =>
      val v = value.asInstanceOf[Long]
      Array.tabulate[Byte](8)(i => ((v >>> (8 * i)) & 0xff).toByte)
    case FloatType =>
      leBytes(java.lang.Float.floatToIntBits(value.asInstanceOf[Float]),
        IntegerType)
    case DoubleType =>
      leBytes(java.lang.Double.doubleToLongBits(value.asInstanceOf[Double]),
        LongType)
    case BooleanType =>
      Array((if (value.asInstanceOf[Boolean]) 1 else 0).toByte)
    case other => throw new IllegalArgumentException(
      s"reinterpretAs*: unsupported input type $other")
  }

  /** Read up to `width` LE bytes as an unsigned long (zero-padded). */
  def leRead(bytes: Array[Byte], width: Int): Long = {
    var v = 0L
    var i = 0
    while (i < math.min(width, bytes.length)) {
      v |= (bytes(i) & 0xffL) << (8 * i)
      i += 1
    }
    v
  }
}

/** reinterpretAs{U}Int8/16/32/64 / Date / DateTime: LE bytes → integer
  * carrier. `bits` is the target width; `resultType` the Spark carrier
  * (unsigned lanes use the established widened carriers). */
case class ReinterpretToLong(child: Expression, bits: Int,
    resultType: DataType) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = resultType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = {
    val raw = ReinterpretBytes.leRead(
      ReinterpretBytes.leBytes(input, child.dataType), bits / 8)
    // sign-extend for signed targets narrower than 64 bits
    val signed = resultType match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
          TimestampType => true
      case _ => false
    }
    val v =
      if (signed && bits < 64) (raw << (64 - bits)) >> (64 - bits)
      else raw
    resultType match {
      case ByteType => v.toByte
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case LongType => v
      case DateType => (raw & 0xffffL).toInt // reinterpretAsDate: u16 days
      case TimestampType => (raw & 0xffffffffL) * 1000000L // u32 epoch secs
      case d: DecimalType => Decimal(BigDecimal(java.lang.Long.toUnsignedString(raw)), d.precision, d.scale)
      case other => throw new IllegalArgumentException(s"bad carrier $other")
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "reinterpret_to_int"
}

/** reinterpretAsFloat32/64: LE bytes → IEEE float of that width. */
case class ReinterpretToFloat(child: Expression, wide: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = if (wide) DoubleType else FloatType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = ReinterpretBytes.leBytes(input, child.dataType)
    if (wide)
      java.lang.Double.longBitsToDouble(ReinterpretBytes.leRead(bytes, 8))
    else
      java.lang.Float.intBitsToFloat(ReinterpretBytes.leRead(bytes, 4).toInt)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "reinterpret_to_float"
}

/** reinterpretAsString / reinterpretAsFixedString(n-free form): the LE
  * byte image, trailing NUL bytes cut for String (reinterpretAs.cpp:348
  * "Cut trailing zero bytes"), kept for FixedString. */
case class ReinterpretToString(child: Expression, cutTrailingZeros: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = {
    val bytes = ReinterpretBytes.leBytes(input, child.dataType)
    val end =
      if (cutTrailingZeros) {
        var e = bytes.length
        while (e > 0 && bytes(e - 1) == 0) e -= 1
        e
      } else bytes.length
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, 0, end))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "reinterpret_to_string"
}
