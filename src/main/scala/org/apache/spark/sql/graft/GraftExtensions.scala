package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the library's native expressions.
  *
  * Two registration paths, same builder:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (cluster config — new sessions get the functions at build time);
  *  - [[GraftFunctions.register]] on an already-running session (tests,
  *    notebooks).
  */
object GraftFunctions {

  private def binary(
      name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      // surface the standard WRONG_NUM_ARGS AnalysisException (with error
      // class), not a raw IllegalArgumentException, like every built-in
      if (children.size != 2) {
        throw org.apache.spark.sql.errors.QueryCompilationErrors
          .wrongNumArgsError(name, Seq(2), children.size)
      }
      build(children.head, children(1))
    })

  private val all = Seq(
    binary("partial_ratio_sim", classOf[PartialRatioSimExpr], PartialRatioSimExpr(_, _)),
    binary("partial_ratio_fw", classOf[PartialRatioFwExpr], PartialRatioFwExpr(_, _)),
    binary("dot_f", classOf[DotFExpr], DotFExpr(_, _)),
    binary("hamming_dist", classOf[HammingDistExpr], HammingDistExpr(_, _)))

  def register(spark: SparkSession): Unit =
    all.foreach(f =>
      spark.sessionState.functionRegistry.registerFunction(f._1, f._2, f._3))

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
