package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** SQL surface for the library's native expressions.
  *
  * Two registration paths, same builder:
  *  - `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (cluster config — new sessions get the functions at build time);
  *  - [[GraftFunctions.register]] on an already-running session (tests,
  *    notebooks).
  */
object GraftFunctions {

  import graft.functions.TextFunctions

  // surface the standard WRONG_NUM_ARGS AnalysisException (with error
  // class), not a raw IllegalArgumentException, like every built-in
  private def requireArity(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.size != n) {
      throw org.apache.spark.sql.errors.QueryCompilationErrors
        .wrongNumArgsError(name, Seq(n), children.size)
    }

  private def binary(
      name: String, clazz: Class[_],
      build: (Expression, Expression) => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      requireArity(name, 2, children)
      build(children.head, children(1))
    })

  private def unary(
      name: String, clazz: Class[_],
      build: Expression => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => {
      requireArity(name, 1, children)
      build(children.head)
    })

  /** Composed-expression functions: the builder assembles the SAME
    * Catalyst tree the Column API builds (no UDF, stays codegen'd), so
    * SQL users get the reference's callable text functions byte-identical
    * to the DataFrame surface. The Column node tree is converted to a
    * Catalyst tree EAGERLY (ColumnNodeToExpressionConverter) — a lazy
    * ColumnNodeExpression wrapper returned from a registry builder never
    * gets converted by the analyzer and dies Unevaluable at codegen.
    */
  private def composed(name: String, owner: Class[_], build: Column => Column) = (
    FunctionIdentifier(name),
    new ExpressionInfo(owner.getName, name),
    (children: Seq[Expression]) => {
      requireArity(name, 1, children)
      ColumnNodeToExpressionConverter(build(ExpressionUtils.column(children.head)).node)
    })

  private def composed3(
      name: String, owner: Class[_],
      build: (Column, Column, Column) => Column) = (
    FunctionIdentifier(name),
    new ExpressionInfo(owner.getName, name),
    (children: Seq[Expression]) => {
      requireArity(name, 3, children)
      ColumnNodeToExpressionConverter(build(
        ExpressionUtils.column(children.head),
        ExpressionUtils.column(children(1)),
        ExpressionUtils.column(children(2))).node)
    })

  private val all = Seq(
    binary("partial_ratio_sim", classOf[PartialRatioSimExpr], PartialRatioSimExpr(_, _)),
    binary("partial_ratio_fw", classOf[PartialRatioFwExpr], PartialRatioFwExpr(_, _)),
    binary("dot_f", classOf[DotFExpr], DotFExpr(_, _)),
    binary("hamming_dist", classOf[HammingDistExpr], HammingDistExpr(_, _)),
    unary("nfc_normalize", classOf[NfcNormalizeExpr], NfcNormalizeExpr(_)),
    unary("image_dims", classOf[ImageDimsExpr], ImageDimsExpr(_)),
    unary("media_meta", classOf[MediaMetaExpr], MediaMetaExpr(_)),
    unary("stem_indonesian", classOf[StemIndonesianExpr], StemIndonesianExpr(_)),
    // single-pass byte-loop text-quality counters (the regex spellings
    // are java.util.regex's worst case on clean corpora — see TextStats)
    unary("token_count", classOf[TokenCountExpr], TokenCountExpr(_)),
    unary("punct_count", classOf[NonAlnumCountExpr], NonAlnumCountExpr(_)),
    // the reference's two cleaning functions (utils.py:28-50;
    // src/resilient_scraper.py:868-889), its strip gate, and the
    // text-analysis scalars — a spark.sql user can run the whole cleaning
    // stage without touching the Column API
    composed("clean_tweet_text", TextFunctions.getClass, TextFunctions.cleanTweetText),
    composed("clean_text_scraper", TextFunctions.getClass, TextFunctions.cleanTextScraper),
    composed("py_strip", TextFunctions.getClass, TextFunctions.pyStrip),
    composed("lang_id", TextFunctions.getClass, TextFunctions.langId),
    composed("doc_fingerprint", TextFunctions.getClass, TextFunctions.fingerprint),
    composed("doc_fingerprint60", TextFunctions.getClass, TextFunctions.fingerprint60),
    // content-addressed train/val/test assignment (curation layer) at the
    // library-default 80/10/10 — SQL pipelines split without the Column API
    composed("dataset_split", graft.operators.Curation.getClass,
      t => graft.operators.Curation.splitColumn(t)),
    // 64-bit SimHash of raw text (production xxhash64 token hash) — with
    // the built-in bit_count(a ^ b), SQL users run near-dup detection
    // end-to-end (hamming_dist above is the array-sketch variant)
    composed("simhash64", graft.operators.Dedup.getClass, t =>
      graft.operators.Dedup.simHash(
        graft.operators.Dedup.tokens(org.apache.spark.sql.functions.lower(t)))),
    // PII scrub (curation layer): same regexp_replace cascade as the
    // Column API, so SQL pipelines can redact before anything else reads
    // the text
    composed("redact_pii", TextFunctions.getClass, TextFunctions.redactPii),
    // perceptual 64-bit difference hash over a 9×8 luminance grid (the
    // decodeFeatures `feat` column) — with the built-in bit_count(a ^ b),
    // SQL users run image near-dup detection over decoded grids the same
    // way simhash64 covers text
    composed("dhash64", graft.operators.Multimodal.getClass,
      t => graft.operators.Multimodal.dHash64(t)),
    // Efraimidis–Spirtakis weighted-sampling priority (key, weight, salt):
    // ORDER BY aes_priority(...) DESC LIMIT k IS a weighted sample
    // without replacement, entirely in SQL
    composed3("aes_priority", graft.operators.Curation.getClass,
      (k, w, s) => graft.operators.Curation.aesPriority(k, w, s)),
    // fixed-width overlapping passage chunks of one document —
    // LATERAL VIEW explode(chunk_passages(text, width, stride)) is the
    // SQL spelling of the chunkPassages relation operator
    composed3("chunk_passages", graft.operators.Curation.getClass,
      (t, w, s) => graft.operators.Curation.chunkPassagesCol(t, w, s)))

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
