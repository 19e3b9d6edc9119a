package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** The type-default ("zero") value of `child`'s data type: 0 for numerics,
  * '' for strings, false for booleans — without evaluating `child` (it is
  * only a type carrier). Needed by the registry's arrayFirst/arrayLast
  * builders: the reference returns the element type's DEFAULT when no
  * element matches (src/Functions/array/arrayFirstLast.cpp), and the
  * builder runs pre-analysis where the element type is still unknown, so
  * the default must be derived at resolution time. */
case class TypeDefault(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_type_default"
  override def eval(input: InternalRow): Any = Literal.default(dataType).value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    Literal.default(dataType).doGenCode(ctx, ev)
  override protected def withNewChildInternal(newChild: Expression): TypeDefault =
    copy(child = newChild)
}
