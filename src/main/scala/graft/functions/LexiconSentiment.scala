package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic lexicon-based sentiment scorer — the test-stable stand-in
  * for the reference's HuggingFace classifier (SURVEY.md §2.4 E4,
  * utils.py:53-92). Same output contract: a (label, confidence_score)
  * struct with labels in {positive, neutral, negative} and the
  * empty/zero-signal fallback ("NEUTRAL", 0.0) mapped to neutral
  * confidence 0.0 (utils.py:92).
  *
  * Production-model integration goes through
  * [[graft.operators.SentimentRunner]]'s batched mapPartitions runner (its
  * LexiconClassifier agrees with this object bit-for-bit); this object is
  * the pure-column scorer, fully codegen'd, no UDF.
  */
object LexiconSentiment {

  /** The reference's VERBATIM empty/error fallback label — uppercase
    * 'NEUTRAL' (utils.py:82,92), unlike the model-vocabulary labels
    * (lowercase positive/neutral/negative). One casing rule across the
    * library: null/empty INPUT → 'NEUTRAL' 0.0 (the classify_sentiment
    * fallback); a no-signal TIE on real text → lowercase 'neutral' (a
    * vocabulary label). Kept verbatim so label distributions diff cleanly
    * against a reference-produced store, where error rows bucket as
    * 'NEUTRAL'.
    */
  val FallbackLabel = "NEUTRAL"

  /** A sentiment lexicon: ordered positive / negative word lists. */
  final case class Lexicon(positive: Seq[String], negative: Seq[String])

  /** For the synthetic `documents` table (engine-vocabulary word bags). */
  val EngineWords: Lexicon =
    Lexicon(Seq("fast", "good", "great"), Seq("slow", "bad", "error"))

  /** Indonesian lexicon for the tweet-parity pipeline (MBG domain). */
  val Indonesian: Lexicon = Lexicon(
    Seq("bagus", "baik", "mantap", "enak", "sehat", "senang", "bergizi",
      "gratis", "membantu", "terima kasih", "sukses", "lancar"),
    Seq("buruk", "jelek", "gagal", "korupsi", "basi", "mahal", "kecewa",
      "lambat", "keracunan", "bohong", "rugi", "telat"))

  def positiveHits(text: Column, lex: Lexicon): Column =
    TextFunctions.wordHits(lower(text), lex.positive)

  def negativeHits(text: Column, lex: Lexicon): Column =
    TextFunctions.wordHits(lower(text), lex.negative)

  /** Label: positive / negative by majority hit count, neutral on ties or
    * no signal; null/empty input takes the reference's verbatim
    * [[FallbackLabel]] ('NEUTRAL', utils.py:82,92).
    */
  def label(text: Column, lex: Lexicon): Column = {
    val p = positiveHits(text, lex)
    val n = negativeHits(text, lex)
    when(text.isNull || length(text) === 0, FallbackLabel)
      .when(p > n, "positive").when(n > p, "negative").otherwise("neutral")
  }

  /** Confidence: |p-n| / (p+n), 0.0 when no lexicon hits (the reference's
    * NEUTRAL/0.0 fallback path).
    */
  def confidence(text: Column, lex: Lexicon): Column = {
    val p = positiveHits(text, lex)
    val n = negativeHits(text, lex)
    coalesce(abs(p - n).cast("double") / nullif((p + n).cast("double"), lit(0.0)), lit(0.0))
  }

  /** The full (label, confidence_score) struct matching the reference's
    * sentiment_analysis field (utils.py:187-190).
    */
  def score(text: Column, lex: Lexicon): Column =
    struct(label(text, lex).as("label"), confidence(text, lex).as("confidence_score"))
}
