package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the CCNet-style "perplexity
  * filter" every large-scale corpus pipeline runs before training
  * (reference corpus curation stage: the repo's quality gates at
  * utils.py:28-50 filter on surface signals; this adds the statistical
  * fluency signal those heuristics cannot see).
  *
  * Shape, designed for 100 TB:
  *
  *  - '''Training''' is two bounded aggregations: a token-grain unigram
  *    count (one exchange, map-side combined) capped to a top-`vocabSize`
  *    vocabulary, and a bigram-grain count capped to the top-`maxBigrams`
  *    bigrams. Both caps have fully deterministic tiebreaks (count desc,
  *    then token(s) asc), so the LM is a reproducible CONFIG ARTIFACT —
  *    bounded regardless of corpus size, exactly like a pruned KenLM
  *    model file.
  *  - '''Scoring probes are broadcast HASH joins, not map columns.'''
  *    Spark's `element_at`/`map_contains_key` on a map column is a LINEAR
  *    scan of the entries array (the plan shows
  *    `array_contains(map_keys(...))`), so a 65k-entry LM map would cost
  *    O(|LM|) string compares per bigram. Instead the vocab and LM ship
  *    as broadcast relations and every probe is an O(1) codegen'd hash
  *    lookup inside whole-stage codegen.
  *  - '''One doc-grain exchange, map-side combined.''' Bigrams are formed
  *    in array-land (adjacent zip via `transform(sequence(...))` — no
  *    window, no per-doc sort), exploded, probed, then re-aggregated by
  *    document. Partial aggregation collapses each doc's bigrams before
  *    the shuffle, so the exchange moves ONE small row per document —
  *    never token-grain data, and the corpus text never shuffles at all.
  *  - '''Float-order-proof arithmetic.''' Each bigram's add-one-smoothed
  *    ln p(w2|w1) is scaled by 1e7 and rounded to a LONG at the leaf;
  *    per-document and per-group totals are therefore exact integer sums
  *    — immune to the float association-order divergence that plagues
  *    cross-engine comparison of summed doubles. Doubles only reappear
  *    in the final display division, computed identically by any engine.
  *
  * Smoothing: add-one over the effective vocabulary (`|V| + 1` for
  * `<unk>`), history count h(w1) = total bigrams with left context w1
  * (from the UNCAPPED bigram table, so probabilities stay proper even
  * when the storage cap drops tail bigrams to zero).
  */
object NgramLm {

  /** Word tokenizer shared with the oracle: runs of [a-z0-9] over the
    * lowercased text. `<unk>` cannot collide with any real token.
    */
  val TokenRegex = "[a-z0-9]+"
  val Unk = "<unk>"

  /** ln p scaled to integer space: round(ln(p) * 1e7) as long. */
  val LpScale = 10000000L

  /** Trained bigram LM: three bounded relations plus the 1-row smoothing
    * denominator term. Every piece is capped, so all of them broadcast at
    * any corpus size.
    *
    * @param vocab   top-`vocabSize` tokens: (w)
    * @param bigrams top-`maxBigrams` counts over the vocab-mapped stream:
    *                (w1, w2, c)
    * @param history UNCAPPED left-context totals: (w1, h)
    * @param vtot    1-row (vtot = |vocab| + 1) — the add-one denominator
    */
  case class Lm(vocab: DataFrame, bigrams: DataFrame,
      history: DataFrame, vtot: DataFrame)

  /** Adjacent-token bigram rows without a window or per-doc sort: raw
    * pairs zip in array-land, explode, then two broadcast hash joins map
    * each side through the vocab (miss → `<unk>`). Docs with < 2 tokens
    * emit ONE sentinel row with null m1/m2 (so downstream per-doc
    * aggregation keeps every document); callers that only want real
    * bigrams filter `m1 IS NOT NULL`.
    */
  /** `textCol` as a token array: pre-tokenized ARRAY<STRING> columns
    * pass through unchanged, anything else tokenizes here. Lets a caller
    * that tokenizes once (and, say, checkpoints the result) feed the
    * same array to [[train]] AND [[score]] — the registered q_bigram_lm
    * ran the corpus regex three times (unigram pass, bigram pass,
    * scoring pass) before r17.
    */
  private[graft] def toksExpr(df: DataFrame, textCol: String) =
    df.schema(textCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => col(textCol)
      case _ => regexp_extract_all(lower(col(textCol)), lit(TokenRegex), lit(0))
    }

  private def mappedBigrams(docs: DataFrame, textCol: String,
      vocab: DataFrame, carry: Seq[String]): DataFrame = {
    // Pair-building rule: NEVER index the token array from inside a
    // lambda body. CollapseProject inlines the `__l` alias into the
    // lambda, and `element_at(<regexp_extract_all>, i)` then re-runs the
    // regex PER ELEMENT — measured ~10× on the registered query. zip_with
    // over two slices evaluates the (inlined) array expression a constant
    // number of times per ROW instead.
    val toks = docs.withColumn("__l", toksExpr(docs, textCol))
    val pairs = toks.withColumn("__p",
      when(size(col("__l")) >= 2, expr(
        "zip_with(slice(__l, 1, size(__l) - 1), slice(__l, 2, size(__l) - 1), (a, b) -> struct(a AS r1, b AS r2))"))
        .otherwise(array(struct(
          lit(null).cast("string").as("r1"), lit(null).cast("string").as("r2")))))
      .select(carry.map(col) :+ explode(col("__p")).as("__b"): _*)
      .select(carry.map(col) :+ col("__b.r1") :+ col("__b.r2"): _*)
    val v1 = broadcast(vocab.select(col("w").as("__v1")))
    val v2 = broadcast(vocab.select(col("w").as("__v2")))
    pairs
      .join(v1, col("r1") === col("__v1"), "left")
      .join(v2, col("r2") === col("__v2"), "left")
      .select(carry.map(col) :+
        when(col("r1").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__v1"), lit(Unk))).as("m1") :+
        when(col("r2").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__v2"), lit(Unk))).as("m2"): _*)
  }

  /** Train the capped LM and MATERIALIZE it as local relations.
    * Deterministic by construction: both caps break count ties on token
    * text ascending.
    *
    * `textCol` contract (also for [[score]]): a STRING column is
    * lowercased and tokenized with [[TokenRegex]] here; an ARRAY<STRING>
    * column passes through UNTOUCHED — the caller must have lowercased
    * and tokenized with the SAME regex (the r17 tokenize-once pattern,
    * e.g. q_bigram_lm's shared scratch), or train and score build
    * divergent vocabularies with no warning.
    *
    * Two corpus passes total (unigram count, then bigram count), after
    * which the LM — bounded at `vocabSize + maxBigrams + (vocabSize+1)`
    * rows by the caps — is collected to the driver, exactly as a real
    * pipeline persists a pruned LM file once and loads it everywhere.
    * Without this, every broadcast in [[score]] would lazily re-run the
    * whole training pipeline (measured 5× redundant corpus scans). The
    * intermediate bigram-grain count is cached for its two derivations
    * (cap + history); its size is ≤ (vocabSize+1)² rows regardless of
    * corpus size.
    */
  def train(docs: DataFrame, textCol: String,
      vocabSize: Int = 4096, maxBigrams: Int = 1 << 16): Lm = {
    require(vocabSize >= 1 && maxBigrams >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val uni = docs
      .select(explode(toksExpr(docs, textCol)).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val vocabW: Seq[String] = uni.orderBy($"c".desc, $"w").limit(vocabSize)
      .select($"w").collect().map(_.getString(0)).toSeq
    val vocab = vocabW.toDF("w")
    val big = mappedBigrams(docs, textCol, vocab, carry = Nil)
      .filter($"m1".isNotNull)
      .groupBy($"m1".as("w1"), $"m2".as("w2")).agg(count(lit(1)).as("c"))
      .cache()
    val blmRows: Seq[(String, String, Long)] =
      big.orderBy($"c".desc, $"w1", $"w2").limit(maxBigrams)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val histRows: Seq[(String, Long)] =
      big.groupBy($"w1").agg(sum($"c").cast("long").as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    big.unpersist()
    Lm(vocab,
      blmRows.toDF("w1", "w2", "c"),
      histRows.toDF("w1", "h"),
      Seq(Tuple1(vocabW.size + 1L)).toDF("vtot"))
  }

  /** One row per input document: `idCols` plus `n_bigrams` (long, null
    * when the doc has < 2 tokens) and `lp_scaled` (long: exact sum of
    * round(ln p * 1e7) over the doc's bigrams; null when unscored).
    *
    * `idCols` must identify a document (they are the re-aggregation key)
    * and should be small — they ride every bigram row until the map-side
    * combine collapses them. `textCol` follows [[train]]'s contract: an
    * ARRAY<STRING> column must carry the same lowercase+[[TokenRegex]]
    * tokenization the LM was trained on.
    */
  def score(docs: DataFrame, textCol: String, lm: Lm,
      idCols: Seq[String]): DataFrame = {
    require(idCols.nonEmpty, "idCols must name the document key")
    val b = broadcast(lm.bigrams
      .select(col("w1").as("__bw1"), col("w2").as("__bw2"), col("c").as("__c")))
    val h = broadcast(lm.history
      .select(col("w1").as("__hw1"), col("h").as("__h")))
    val terms = mappedBigrams(docs, textCol, lm.vocab, carry = idCols)
      .join(b, col("m1") === col("__bw1") && col("m2") === col("__bw2"), "left")
      .join(h, col("m1") === col("__hw1"), "left")
      .crossJoin(broadcast(lm.vtot))
      .withColumn("__lp", when(col("m1").isNull, lit(null).cast("long"))
        .otherwise(round(
          log((coalesce(col("__c"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("__h"), lit(0L)) + col("vtot")).cast("double")) *
            LpScale, 0).cast("long")))
    terms.groupBy(idCols.map(col): _*)
      .agg(count(col("__lp")).as("__nb"), sum(col("__lp")).as("lp_scaled"))
      .withColumn("n_bigrams", when(col("__nb") > 0, col("__nb")))
      .drop("__nb")
  }
}
