package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-loop runtimes for the two hottest text-quality
  * scalars — replacements for `regexp_count(text, "\\S+")` and
  * `regexp_count(text, "[^A-Za-z0-9\\s]")`, which every quality gate
  * evaluates over every document of the corpus.
  *
  * Why not regex: a SINGLE-CHARACTER class that mostly FAILS to match
  * is java.util.regex's worst case — `find()` restarts an anchored
  * attempt at every position, ~68 ns per failed position measured on
  * JDK 17, so a 439-char alphanumeric document costs ~30 µs to report
  * "0 punctuation chars" (and through Spark's regexp machinery the
  * per-row cost measured ~50× worse again: the CurationScaleBench
  * quality gate spent 104 s of a 186 s wall at n=2 M on exactly this).
  * The byte loop below reads each UTF-8 byte once, no String
  * materialization, no allocation — the same counts at memory-bandwidth
  * speed, and it inlines into whole-stage codegen.
  *
  * Semantics are EXACTLY the regex forms' (differential-pinned in
  * TextStatsExprSpec over ASCII + NBSP/CJK/combining/supplementary
  * inputs):
  *
  *  - token_count: `\s` without UNICODE_CHARACTER_CLASS is the ASCII
  *    set [ \t\n\x0B\f\r], so a token is a maximal run of bytes
  *    OUTSIDE that set; every non-ASCII byte is token mass (NBSP
  *    SEPARATES NOTHING — it is \S, same as the regex).
  *  - punct count: one per CODE POINT neither ASCII-alphanumeric nor
  *    ASCII whitespace. Java regex matches classes per code point, so
  *    a 4-byte emoji is ONE punct char: counting UTF-8 LEAD bytes
  *    (skipping 10xxxxxx continuations) reproduces that exactly.
  */
object TextStats {

  /** ASCII whitespace per Java regex `\s` (NO unicode flag): space,
    * tab, LF, VT, FF, CR.
    */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  /** == regexp_count(s, "\\S+"): maximal non-ASCII-whitespace runs. */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    var inTok = false
    while (i < n) {
      val b = s.getByte(i)
      // continuation bytes (10xxxxxx) are never ws, so treating them
      // as plain token mass keeps runs intact without decoding
      val ws = b >= 0 && isWs(b)
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    count
  }

  /** == regexp_count(s, "[^A-Za-z0-9\\s]"): code points neither
    * ASCII-alphanumeric nor ASCII whitespace.
    */
  def nonAlnumCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if (!isAlnum(b) && !isWs(b)) count += 1
      } else if ((b & 0xC0) != 0x80) { // UTF-8 lead byte = one code point
        count += 1
      }
      i += 1
    }
    count
  }
}

private[graft] sealed abstract class TextStatsCountExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
}

/** `token_count(string) -> int` — whitespace-delimited token count as a
  * single-pass codegen byte loop (see [[TextStats]]).
  */
case class TokenCountExpr(child: Expression) extends TextStatsCountExpr {
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(s: Any): Any =
    TextStats.tokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextStats.tokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `punct_count(string) -> int` — non-alphanumeric non-whitespace code
  * point count as a single-pass codegen byte loop (see [[TextStats]]).
  */
case class NonAlnumCountExpr(child: Expression) extends TextStatsCountExpr {
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(s: Any): Any =
    TextStats.nonAlnumCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextStats.nonAlnumCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpr {
  def tokenCount(text: Column): Column =
    ExpressionUtils.column(TokenCountExpr(ExpressionUtils.expression(text)))
  def punctCount(text: Column): Column =
    ExpressionUtils.column(NonAlnumCountExpr(ExpressionUtils.expression(text)))
}
