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

  private val partialRatio = (
    FunctionIdentifier("partial_ratio_sim"),
    new ExpressionInfo(classOf[PartialRatioSimExpr].getName, "partial_ratio_sim"),
    (children: Seq[Expression]) => {
      // surface the standard WRONG_NUM_ARGS AnalysisException (with error
      // class), not a raw IllegalArgumentException, like every built-in
      if (children.size != 2) {
        throw org.apache.spark.sql.errors.QueryCompilationErrors
          .wrongNumArgsError("partial_ratio_sim", Seq(2), children.size)
      }
      PartialRatioSimExpr(children.head, children(1))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(partialRatio._1, partialRatio._2, partialRatio._3)

  private[graft] def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(partialRatio)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
