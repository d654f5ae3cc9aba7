package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rule runtime for [[StemIndonesianExpr]] — a SIMPLIFIED Indonesian
  * stemmer in the Porter-for-Bahasa tradition (Tala, "A Study of
  * Stemming Effects on Information Retrieval in Bahasa Indonesia", 2003;
  * rule families from Nazief & Adriani 1996): affix classes stripped in
  * the published order —
  *
  *  1. inflectional particles: -lah, -kah, -tah, -pun;
  *  2. possessive pronouns: -ku, -mu, -nya;
  *  3. derivational prefixes, longest-match first, at most two strips:
  *     meng-/meny-/mem-/men-/me-, peng-/peny-/pem-/pen-/pe-, ber-,
  *     ter-, per-, di-, ke-, se-;
  *  4. derivational suffixes: -kan, -an, -i (these demand >= 4
  *     remaining characters — see MinSuffixStem).
  *
  * Each strip requires >= 3 characters of stem to remain (the standard
  * minimum-stem guard; 4 for derivational suffixes). DELIBERATELY simplified: no recoding rules
  * (meny- + vowel restoring the elided s/p/t/k) and no root-dictionary
  * check, so sound-changed derivations (menyanyi, pemandangan) stem to
  * the elided form — the trade every dictionary-free stemmer makes.
  * The RULE CASCADE itself is exact and portable: the oracle replays
  * it as a lateral CASE chain, so both engines agree on every token.
  */
object StemIndonesian {

  private val Particles = Seq("lah", "kah", "tah", "pun")
  private val Possessives = Seq("nya", "ku", "mu")
  // longest-match-first WITHIN each family: per/pen/pem must be tried
  // before their prefix "pe" or the find-first would strip the shorter
  // rule ("diperbaiki" → di → "pe"?? → "rbaiki")
  private val Prefixes = Seq(
    "meng", "meny", "mem", "men", "me",
    "peng", "peny", "pem", "pen", "per", "pe",
    "ber", "ter", "di", "ke", "se")
  private val Suffixes = Seq("kan", "an", "i")
  private val MinStem = 3
  // derivational suffixes demand a longer remainder: with 3, 'makan'
  // strips to 'mak' and 'jalan' to 'jal' — folding unrelated roots
  // together is worse for retrieval than keeping an occasional affix
  private val MinSuffixStem = 4

  /** The rule tables, exposed for the oracle-SQL generator (shared-
    * constant discipline).
    */
  def particleRules: Seq[String] = Particles
  def possessiveRules: Seq[String] = Possessives
  def prefixRules: Seq[String] = Prefixes
  def suffixRules: Seq[String] = Suffixes
  def minStem: Int = MinStem
  def minSuffixStem: Int = MinSuffixStem

  private def stripSuffix(w: String, sufs: Seq[String], min: Int): String =
    sufs.find(s => w.length >= s.length + min && w.endsWith(s))
      .map(s => w.substring(0, w.length - s.length)).getOrElse(w)

  private def stripOnePrefix(w: String): String =
    Prefixes.find(p => w.length >= p.length + MinStem && w.startsWith(p))
      .map(p => w.substring(p.length)).getOrElse(w)

  def stem(word: String): String = {
    var w = word
    w = stripSuffix(w, Particles, MinStem)
    w = stripSuffix(w, Possessives, MinStem)
    val p1 = stripOnePrefix(w)
    w = if (p1 ne w) stripOnePrefix(p1) else w // at most two prefix strips
    stripSuffix(w, Suffixes, MinSuffixStem)
  }

  def stemUtf8(word: UTF8String): UTF8String =
    UTF8String.fromString(stem(word.toString))
}

/** `stem_indonesian(string) -> string` — the simplified Tala/Porter
  * Bahasa Indonesia stemmer as a single whole-stage-codegen expression,
  * the reference-domain member of the text-analysis scalars (the corpus
  * under study IS Indonesian tweets). Null in, null out.
  */
case class StemIndonesianExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stem_indonesian requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stem_indonesian"

  override protected def nullSafeEval(word: Any): Any =
    StemIndonesian.stemUtf8(word.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.StemIndonesian.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StemIndonesianExpr {
  def stemIndonesian(word: Column): Column =
    ExpressionUtils.column(StemIndonesianExpr(ExpressionUtils.expression(word)))
}
