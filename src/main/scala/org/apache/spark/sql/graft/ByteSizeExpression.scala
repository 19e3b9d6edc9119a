package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** byteSize (reference src/Functions/byteSize.cpp): the in-memory byte
  * footprint of a VALUE per the reference's sizing contract — fixed
  * types report sizeof, String reports length + 9 (data + length
  * prefix), arrays sum their elements plus the 8-byte size header.
  * Runtime dispatch on the child type; diagnostic surface, not a hot
  * path (CodegenFallback). */
case class ByteSizeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private def sizeOf(value: Any, dt: DataType): Long = dt match {
    case BooleanType | ByteType => 1L
    case ShortType => 2L
    case IntegerType | FloatType | DateType => 4L
    case LongType | DoubleType | TimestampType => 8L
    case d: DecimalType => if (d.precision <= 18) 8L else 16L
    case StringType =>
      value.asInstanceOf[UTF8String].numBytes().toLong + 9L
    case BinaryType => value.asInstanceOf[Array[Byte]].length.toLong + 9L
    case ArrayType(et, _) =>
      val a = value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var s = 8L
      var i = 0
      while (i < a.numElements()) {
        if (!a.isNullAt(i)) s += sizeOf(a.get(i, et), et)
        i += 1
      }
      s
    case other => throw new IllegalArgumentException(
      s"byteSize: unsupported type $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    sizeOf(input, child.dataType)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bytesize"
}
