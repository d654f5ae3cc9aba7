package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression wrapping [[graft.functions.PartialRatioImpl.sim]]:
  * participates in whole-stage codegen via a static call, no UDF
  * SerDe, null handling inherited from BinaryExpression.
  *
  * Lives under `org.apache.spark.sql` because the expression-author API
  * surface (`AbstractDataType` for ImplicitCastInputTypes, the
  * Column<->Expression bridge in `classic.ExpressionUtils`) is
  * `private[sql]` — the standard placement for third-party native
  * expressions.
  */
case class PartialRatioSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "partial_ratio_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.PartialRatioImpl.sim(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PartialRatioImpl.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PartialRatioSimExpr {
  /** Column API for the native expression. */
  def sim(a: Column, b: Column): Column =
    ExpressionUtils.column(PartialRatioSimExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
