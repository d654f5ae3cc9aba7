package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(string) -> string` — Unicode canonical composition
  * (NFC), the text-canonicalization step that belongs BEFORE any dedup
  * key or shingle computation: "café" with a precomposed é and "café"
  * with e + U+0301 are byte-different (different hashes, different
  * shingles, different dedup keys) but render identically — un-normalized
  * corpora silently under-deduplicate.
  *
  * Spark has no built-in for this; a Scala UDF would break whole-stage
  * codegen on the hottest projection of a curation pipeline, so it is a
  * native expression like [[DotFExpr]]: the generated code is one static
  * call into [[graft.functions.UnicodeOps]], whose pure-ASCII fast path
  * (numBytes == numChars) returns the input UTF8String untouched with no
  * decode and no allocation — the cost on a clean ASCII corpus is one
  * byte-length scan per string.
  *
  * Both java.text.Normalizer and DuckDB's nfc_normalize implement UAX #15
  * for the same Unicode version class, which is what lets the DuckDB
  * oracle check this expression end-to-end.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${dt.sql}")
  }

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    graft.functions.UnicodeOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def nfc(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))
}
