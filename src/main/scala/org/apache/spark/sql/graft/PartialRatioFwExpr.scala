package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `partial_ratio_fw(a, b) -> int` — fuzzywuzzy's partial_ratio with the
  * reference's exact difflib fallback semantics
  * ([[graft.functions.DifflibRatio]]), as a codegen static call like
  * [[PartialRatioSimExpr]]. The two scorers coexist deliberately:
  * `partial_ratio_sim` (windowed levenshtein) is SQL-oracle-expressible
  * and stays on the registered query; this one is bit-parity with the
  * executed reference (golden-pinned), for users who need fuzzywuzzy's
  * exact integer scores.
  */
case class PartialRatioFwExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "partial_ratio_fw"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.DifflibRatio.partialRatio(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DifflibRatio.partialRatio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PartialRatioFwExpr {
  /** Column API for the native expression. */
  def partialRatioFw(a: Column, b: Column): Column =
    ExpressionUtils.column(PartialRatioFwExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
