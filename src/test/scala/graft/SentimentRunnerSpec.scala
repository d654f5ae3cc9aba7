package graft

import org.apache.spark.sql.functions._

import graft.functions.LexiconSentiment
import graft.operators.{LexiconClassifier, OnnxSentimentClassifier, SentimentRunner}

class SentimentRunnerSpec extends SparkSpec {

  private val texts = Seq(
    "makanan bagus dan sehat sekali",
    "program gagal total korupsi dimana mana",
    "biasa saja tidak ada yang spesial",
    "bagus tapi mahal dan telat",
    "",
    "mantap lancar sukses bergizi",
    "keracunan massal basi jelek buruk",
    "x " * 300 + "bagus") ++ (1 to 13).map(i => s"doc $i netral")

  test("runner output is independent of the batch split") {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
    val cls = LexiconClassifier(LexiconSentiment.Indonesian)
    def run(bs: Int) = SentimentRunner.label(df, "txt", cls, bs)
      .select($"id", $"sentiment_label", round($"sentiment_confidence", 6))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val byOne = run(1)
    assert(run(7) == byOne)
    assert(run(50) == byOne)
  }

  test("mapPartitions runner agrees with the columnar lexicon scorer") {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
    val viaRunner = SentimentRunner.label(df, "txt", LexiconClassifier(LexiconSentiment.Indonesian))
      .select($"id", $"sentiment_label", round($"sentiment_confidence", 6))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val viaColumns = df
      .select($"id",
        LexiconSentiment.label(substring($"txt", 1, 512), LexiconSentiment.Indonesian),
        round(LexiconSentiment.confidence(substring($"txt", 1, 512), LexiconSentiment.Indonesian), 6))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(viaRunner == viaColumns)
  }

  test("null and empty text fall back to neutral 0.0 (reference NEUTRAL fallback)") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "   ")).toDF("id", "txt")
    val got = SentimentRunner.label(df, "txt", LexiconClassifier(LexiconSentiment.Indonesian))
      .select($"id", $"sentiment_label", $"sentiment_confidence")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "neutral", 0.0), (2L, "neutral", 0.0), (3L, "neutral", 0.0)))
  }

  test("ONNX classifier: dependency-gated with a clear error; softmax is a distribution") {
    // this container carries neither ai.onnxruntime nor DJL tokenizers —
    // the reflective gate must report that, and a classify attempt must
    // name the missing jars instead of NoClassDefFounding mid-batch
    assert(!OnnxSentimentClassifier.isAvailable)
    val clf = OnnxSentimentClassifier("/models/m.onnx", "/models")
    // reference fallback contract holds even before the runtime gate:
    // null/empty short-circuit to ('neutral', 0.0) without touching it
    assert(clf.classifyBatch(Seq(null, "")) == Seq(("neutral", 0.0), ("neutral", 0.0)))
    val e = intercept[IllegalStateException] { clf.classifyBatch(Seq("bagus sekali")) }
    assert(e.getMessage.contains("onnxruntime") && e.getMessage.contains("classpath"))
    // the scoring math that runs once the runtime is present
    val p = OnnxSentimentClassifier.softmax(Array(2.0f, 1.0f, 0.1f))
    assert(math.abs(p.sum - 1.0) < 1e-12 && p(0) > p(1) && p(1) > p(2))
    assert(math.abs(p(0) - 0.659001138885) < 1e-9)
  }
}
