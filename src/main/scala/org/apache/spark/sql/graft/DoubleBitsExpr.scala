package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** `sortable_double_bits(double) -> long`: the order-isomorphic IEEE-754
  * bit pattern — `b = doubleToLongBits(v); b ^ ((b >> 63) & Long.MaxValue)`
  * (sign-aware bit flip). For any doubles a <= b (numeric order, NaN
  * excluded), sortable(a) <= sortable(b) as SIGNED longs, with -0.0
  * mapping one below +0.0 (a refinement of numeric order: equal values
  * stay adjacent, so order statistics computed over the mapped longs
  * resolve to the same double).
  *
  * The map is self-inverse on the bit level: applying the same transform
  * to the long and reinterpreting via `longBitsToDouble` recovers the
  * exact input double ([[SortableDoubleBitsExpr.invert]] — driver-side
  * use in [[graft.operators.Quantiles]]).
  *
  * Motivation (r18, guide §1.2 fewer passes): radix bucketing on these
  * bits needs NO data-dependent (min, max) seed, so the quantile
  * bracketing operator's first histogram runs without the extent scan —
  * one fewer distributed pass + driver collect per invocation. Codegen'd
  * (two ALU ops per row); NaN canonicalizes via doubleToLongBits but
  * callers filter NaN before bucketing.
  */
case class SortableDoubleBitsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sortable_double_bits requires a double input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sortable_double_bits"

  override protected def nullSafeEval(v: Any): Any =
    SortableDoubleBitsExpr.toSortable(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b ^ (($b >> 63) & 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableDoubleBitsExpr {

  def toSortable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Exact inverse of [[toSortable]] (the transform is an involution on
    * the bit pattern): recovers the original double, bit for bit.
    */
  def invert(sortable: Long): Double =
    java.lang.Double.longBitsToDouble(
      sortable ^ ((sortable >> 63) & Long.MaxValue))

  /** Column API. */
  def sortableBits(v: Column): Column =
    ExpressionUtils.column(SortableDoubleBitsExpr(ExpressionUtils.expression(v)))
}
