package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Multinomial naive Bayes text classification, trained AND evaluated
  * wholly in-engine — the workhorse behind fasttext-style quality/language
  * classifiers in corpus pipelines (CCNet's quality buckets, language-ID
  * gates), here as a Spark-native operator with an exactness gate instead
  * of an external model file.
  *
  * Scale/determinism contract (the [[NgramLm]] playbook):
  *
  *  - '''Training is two corpus passes''' — a token-grain unigram count
  *    for the capped vocabulary, then a (class, token)-grain count — both
  *    map-side combined, single exchange each. Class count and vocabulary
  *    are capped with deterministic tiebreaks, so the model is a bounded,
  *    reproducible artifact: a DENSE (vocab+unk) × classes log-likelihood
  *    matrix plus log priors, collected to local relations once (a few MB
  *    at the default caps) so scoring never re-runs training.
  *  - '''Scoring''' explodes mapped tokens, broadcast-hash-joins the
  *    matrix (each token row fans out to exactly |classes| rows), and
  *    re-aggregates: shuffle volume is |classes| rows per document after
  *    the map-side combine, then one row per document for the argmax.
  *  - '''Integer-exact argmax.''' Log-likelihoods are scaled by 1e7 and
  *    rounded to longs at the leaf (add-one smoothing over |vocab|+1);
  *    per-class scores are exact integer sums, and the winner is
  *    `min(struct(-score, class))` — ties break on class name ascending,
  *    never on float noise.
  *
  * Documents with zero tokens produce no score rows and are absent from
  * the output — callers that must account for every row left-join.
  */
object NaiveBayes {

  /** Local (collected) model relations: `matrix` (tok, cls, lp) dense over
    * (vocab + `<unk>`) × classes; `priors` (cls, pr); `vocab` (w).
    */
  case class Model(matrix: DataFrame, priors: DataFrame, vocab: DataFrame)

  /** Train on `docs`, labels from `labelCol`. Deterministic: vocabulary
    * cap breaks count ties on token ascending; class set is required
    * bounded (`maxClasses`, loud failure — a runaway label column would
    * otherwise materialize an unbounded matrix).
    *
    * `textCol` contract (also for [[predict]]): a STRING column is
    * lowercased and tokenized internally; an ARRAY<STRING> column passes
    * through UNTOUCHED — the caller must have lowercased and tokenized
    * identically on the train and predict sides (the r17 tokenize-once
    * pattern), or the vocabulary silently diverges.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      vocabSize: Int = 4096, maxClasses: Int = 256): Model = {
    require(vocabSize >= 1 && maxClasses >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    // pre-tokenized ARRAY<STRING> columns pass through (the NgramLm r17
    // rule): a caller that tokenizes once feeds train AND predict
    val toks = docs.select(col(labelCol).as("cls"),
      explode(NgramLm.toksExpr(docs, textCol)).as("t"))
    val vocabW: Seq[String] = toks.groupBy($"t").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"t").limit(vocabSize)
      .collect().map(_.getString(0)).toSeq
    val vocab = vocabW.toDF("w")
    val mapped = toks.join(broadcast(vocab), $"t" === $"w", "left")
      .select($"cls", coalesce($"w", lit(NgramLm.Unk)).as("m"))
    val ccRows = mapped.groupBy($"cls", $"m").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val docCounts: Map[String, Long] = docs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // classes from the DOC counts, not the token counts, so a class whose
    // docs are all token-less still gets priors + a (floor) matrix column
    val classes = docCounts.keysIterator.toSeq.sorted
    require(classes.size <= maxClasses,
      s"naive Bayes: ${classes.size} classes exceeds maxClasses=$maxClasses")
    val nTrainDocs = docCounts.valuesIterator.sum
    val tokensPerClass: Map[String, Long] =
      ccRows.groupMapReduce(_._1._1)(_._2)(_ + _)
    val vtot = vocabW.size + 1L
    val allToks = vocabW :+ NgramLm.Unk
    // HALF_UP (away from zero), matching SQL round() — math.round would
    // round negative .5 boundaries the other way
    def scaled(x: Double): Long = BigDecimal(x * NgramLm.LpScale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val matrix = (for (cls <- classes; t <- allToks) yield {
      val c = ccRows.getOrElse((cls, t), 0L)
      (t, cls, scaled(math.log((c + 1L).toDouble /
        (tokensPerClass.getOrElse(cls, 0L) + vtot).toDouble)))
    }).toDF("tok", "cls", "lp")
    val priors = classes.map { cls =>
      (cls, scaled(math.log(docCounts(cls).toDouble / nTrainDocs.toDouble)))
    }.toDF("cls", "pr")
    Model(matrix, priors, vocab)
  }

  /** One row per document with >= 1 token: (idCols..., predicted). */
  def predict(docs: DataFrame, textCol: String, model: Model,
      idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "idCols must name the document key")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(idCols.map(col) :+
      explode(NgramLm.toksExpr(docs, textCol)).as("t"): _*)
    val mapped = toks.join(broadcast(model.vocab), $"t" === $"w", "left")
      .select(idCols.map(col) :+ coalesce($"w", lit(NgramLm.Unk)).as("m"): _*)
    val scored = mapped
      .join(broadcast(model.matrix), $"m" === $"tok")
      .groupBy((idCols :+ "cls").map(col): _*)
      .agg(sum($"lp").as("__s"))
      .join(broadcast(model.priors), Seq("cls"))
      .withColumn("__score", col("__s") + col("pr"))
    scored.groupBy(idCols.map(col): _*)
      .agg(min(struct((-col("__score")).as("ns"), col("cls"))).as("__best"))
      .select(idCols.map(col) :+ col("__best.cls").as("predicted"): _*)
  }
}
