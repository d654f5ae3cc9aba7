package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DictionaryLocator, LexiconSentiment, TextFunctions}

/** Text-analysis operators over the `documents` table: the reference's
  * cleaning stage (SURVEY §2.3 F1/F2) plus the large-scale training-data
  * pipeline ops (language ID, quality scoring, token counting,
  * fingerprinting, lexicon sentiment, dictionary location detection).
  *
  * All of these are pure projections + hash aggregates: embarrassingly
  * parallel, no shuffle except the final small groupBy, and every scalar is
  * a codegen'd column expression (no UDFs).
  */
object TextQueries {

  import LexiconSentiment.EngineWords
  import TextFunctions._

  /** Deterministic noisy text: the raw documents carry no URLs/mentions/
    * hashtags, so both engines prepend the same synthetic noise before
    * cleaning — this actually exercises the regex cascade.
    */
  private val noisySqlExpr =
    "'see http://ex.com/' || doc_id || ' @user' || doc_id || ' #tag' || doc_id || ' ' || text"

  /** F1 + F2 cleaning variants side by side (utils.py:28-50 vs
    * src/resilient_scraper.py:868-889).
    */
  def cleanText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val noisy = concat(lit("see http://ex.com/"), $"doc_id", lit(" @user"), $"doc_id",
      lit(" #tag"), $"doc_id", lit(" "), $"text")
    Tables.wide(spark, dir, "documents")
      .select($"doc_id",
        substring(cleanTweetText(noisy), 1, 80).as("clean_f1"),
        substring(cleanTextScraper(noisy), 1, 80).as("clean_f2"))
      .orderBy($"doc_id")
  }

  val cleanTextSql: String =
    s"""SELECT doc_id,
       |  substr(lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    $noisySqlExpr,
       |    'http\\S+|www\\S+|https\\S+', '', 'g'), '@\\w+', '[MENTION]', 'g'),
       |    '#\\w+', '[HASHTAG]', 'g'), '\\s+', ' ', 'g'))), 1, 80) AS clean_f1,
       |  substr(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    $noisySqlExpr,
       |    'http\\S+|www\\S+|https\\S+', '[LINK]', 'g'), '@\\w+', '[MENTION]', 'g'),
       |    '#(\\w+)', '\\1', 'g'), '\\s+', ' ', 'g')), 1, 80) AS clean_f2
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Token statistics per source (whitespace + BPE-ish pre-tokenizer). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "documents")
      .select($"source", tokenCount($"text").as("nt"), bpeishTokenCount($"text").as("nb"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"nt").cast("long").as("sum_tokens"),
        round(sum($"nb").cast("double") / count(lit(1)), 4).as("avg_bpeish_tokens"),
        max($"nt").cast("long").as("max_tokens"))
      .orderBy($"source")
  }

  val tokenStatsSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
      |  round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE) / count(*), 4) AS avg_bpeish_tokens,
      |  CAST(max(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS max_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Corpus-wide heavy-hitter share threshold: tokens at >= 0.5 % of the
    * stream. The SQL threshold is generated from this constant and CAST
    * to DOUBLE so both engines run the identical IEEE multiply before
    * CEIL — decimal-vs-binary arithmetic at an integer boundary would
    * otherwise shift the cutoff by one.
    */
  private val HeavyHitterShare = 0.005

  /** Vocabulary heavy hitters: tokens holding >= [[HeavyHitterShare]] of
    * all token occurrences, via [[graft.operators.ScaleOps.heavyHitters]]
    * — a bounded-state Misra–Gries candidate pass plus an exact rescore
    * of candidates only, so the result is EXACT (hash-matched against the
    * naive group-count oracle) while per-executor state stays k counters
    * instead of vocabulary-sized aggregation state.
    */
  def tokenHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r18: tokenize ONCE into a size-gated scratch checkpoint — the
    // Misra–Gries candidate pass and the exact rescore pass inside
    // heavyHitters each consume the token stream, so without the scratch
    // the corpus regex (and the widen exchange) ran twice per query
    // (guide §1.2 fewer passes; the q_bigram_lm pattern). DOC-grain
    // arrays, not the exploded stream: the checkpoint stores one array
    // row per document and both passes explode from cached arrays —
    // exploding is cheap, re-tokenizing is not.
    val tokArrays = graft.operators.Checkpoints.materializeScratch(
      Tables.wide(spark, dir, "documents")
        .select(regexp_extract_all($"text", lit("\\S+"), lit(0)).as("__toks")))
    val toks = tokArrays.select(explode($"__toks").as("token"))
    graft.operators.ScaleOps.heavyHitters(toks, $"token", HeavyHitterShare)
      .select($"key".as("token"), $"n", round($"share", 6).as("share"))
      .orderBy($"n".desc, $"token")
  }

  val tokenHeavyHittersSql: String =
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents),
       |tot AS (SELECT count(*) AS total FROM t),
       |c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
       |SELECT token, n, round(n / (SELECT total FROM tot), 6) AS share
       |FROM c
       |WHERE n >= CEIL(CAST($HeavyHitterShare AS DOUBLE) * (SELECT total FROM tot))
       |ORDER BY n DESC, token""".stripMargin

  /** Terms for [[tfidfTerms]]: lowercase alphanumeric runs of >= 3 chars —
    * a deliberately simple lexer both engines express as one regex, long
    * enough to skip particles that would tie at idf ~ 0.
    */
  private val TfidfTermRegex = "[a-z0-9]{3,}"

  /** Top distinctive terms per source kept by [[tfidfTerms]]. */
  private val TfidfTopK = 5

  /** Top-k distinctive terms per source by TF-IDF (tf · ln(N/df), the
    * classic raw-idf form): tf = occurrences of the term in the source's
    * documents, df = number of distinct documents containing the term,
    * N = corpus document count.
    *
    * Scale shape: ONE tokenize pass feeds a per-(term, doc, source) count
    * (first and only wide exchange over token data); tf and df are narrow
    * re-aggregations of that pre-aggregate, joined on term (both sides
    * vocabulary-sized, not corpus-sized); N arrives as a broadcast 1-row
    * cross join, never a driver collect. The top-k window sorts
    * per-source vocabulary slices, not documents.
    *
    * Cross-engine float discipline: ln is the one operation here that is
    * NOT bit-identical across engines (JVM Math.log vs libm differ by
    * 1 ulp on ~1e-4 of inputs — measured), so the score is rounded to 6
    * decimals BEFORE ranking and ties break on the term; mathematically
    * equal scores computed via different ln calls (e.g. 2·ln4 vs 4·ln2)
    * therefore rank identically in both engines instead of by ulp noise.
    */
  def tfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.wide(spark, dir, "documents")
    val toks = docs.select($"doc_id", $"source",
      explode(regexp_extract_all(lower($"text"), lit(TfidfTermRegex), lit(0))).as("term"))
    // one exchange over token-grain data; everything downstream is
    // vocabulary-grain
    val grain = toks.groupBy($"term", $"doc_id", $"source")
      .agg(count(lit(1)).as("c"))
    // r18: tf and df ride ONE two-level aggregate instead of two
    // independent passes over grain (guide §2.4 shared exchange): level 1
    // keys (term, source) and carries both sum(c) (= tf) and the distinct
    // doc count WITHIN the (term, source) cell — exact because grain is
    // distinct per (term, doc_id, source), so count(*) counts distinct
    // docs; level 2 sums those per-source doc counts into df — exact
    // because doc_id determines source (one documents row per doc), so
    // the per-source distinct-doc sets partition the per-term set. This
    // removes the second grain-sized exchange (the old
    // countDistinct(doc_id) re-shuffled every grain row by (term,
    // doc_id)); level 2's input is vocabulary × sources, not corpus.
    val ts = grain.groupBy($"term", $"source")
      .agg(sum($"c").cast("long").as("tf"), count(lit(1)).as("nd"))
    val tf = ts.select($"source", $"term", $"tf")
    val df = ts.groupBy($"term").agg(sum($"nd").as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .select($"source", $"term", $"tf", $"df",
        round($"tf".cast("double") *
          log($"n_docs".cast("double") / $"df".cast("double")), 6).as("tfidf"))
    val rk = row_number().over(
      Window.partitionBy($"source").orderBy($"tfidf".desc, $"term"))
    scored.withColumn("rk", rk).filter($"rk" <= TfidfTopK).drop("rk")
      .orderBy($"source", $"tfidf".desc, $"term")
  }

  val tfidfTermsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    unnest(regexp_extract_all(lower(text), '$TfidfTermRegex')) AS term
       |  FROM documents),
       |grain AS (
       |  SELECT term, doc_id, source, count(*) AS c
       |  FROM toks GROUP BY term, doc_id, source),
       |tf AS (SELECT source, term, CAST(sum(c) AS BIGINT) AS tf
       |       FROM grain GROUP BY source, term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM grain GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT source, term, tf, df,
       |    round(CAST(tf AS DOUBLE) *
       |      ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
       |  FROM tf JOIN df USING (term)),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY source ORDER BY tfidf DESC, term) AS rk
       |  FROM scored)
       |SELECT source, term, tf, df, tfidf FROM ranked WHERE rk <= $TfidfTopK
       |ORDER BY source, tfidf DESC, term""".stripMargin

  /** Minimum document-frequency SHARE for a term to earn an inverted-index
    * row — share-based so the output stays vocabulary-bounded at every
    * scale factor (an absolute cutoff tuned at sf0.01 would explode the
    * row count at sf0.1; the round-4 stop-shingle incident, generalized).
    */
  private val IndexMinDfShare = 0.02

  /** Posting-page size: each index row carries the first
    * [[IndexPostingsCap]] doc ids ascending — a bounded index PAGE, the
    * unit a search layer would actually store, not the unbounded full
    * posting list.
    */
  private val IndexPostingsCap = 20

  /** Inverted index over the document corpus: one row per term appearing
    * in >= [[IndexMinDfShare]] of documents, with its exact document
    * frequency and first posting page (doc ids ascending, comma-joined —
    * a STRING so the oracle compare is representation-stable).
    *
    * Scale shape: per-document term sets dedup LOCALLY (`array_distinct`
    * before explode — no shuffle spent de-duplicating within a doc); the
    * exact df is a map-side-combined count (one counter per term per
    * partition); the posting page routes through
    * [[graft.operators.ScaleOps.topKPerGroup]] ascending, so each
    * partition ships at most [[IndexPostingsCap]] (term, doc_id) pairs
    * per local term instead of every pair, and the page-assembling
    * collect_list aggregates only window survivors (<= cap · partitions
    * rows per term, never df rows). The df count and page then join at
    * vocabulary grain. The corpus threshold arrives as a broadcast 1-row
    * cross join, never a driver collect.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.wide(spark, dir, "documents")
    // r18: tokenize ONCE into a size-gated scratch checkpoint — the df
    // count and the posting-page candidate pass each consume the term
    // stream, so without the scratch the widen exchange and the
    // regex+array_distinct ran twice per query (probe: two ~830 KB 1-task
    // text exchanges + two tokenize scans; guide §1.2 fewer passes, the
    // q_bigram_lm pattern). Doc-grain distinct-term arrays keep the
    // checkpoint narrow; both consumers explode from cached arrays.
    val termArrays = graft.operators.Checkpoints.materializeScratch(
      docs.select($"doc_id", array_distinct(
        regexp_extract_all(lower($"text"), lit(TfidfTermRegex), lit(0)))
        .as("__terms")))
    val grain = termArrays.select($"doc_id", explode($"__terms").as("term"))
    val dfCounts = grain.groupBy($"term").agg(count(lit(1)).as("df"))
    val page = graft.operators.ScaleOps
      .topKPerGroup(grain, Seq("term"), orderCol = "doc_id", tieCol = "doc_id",
        k = IndexPostingsCap, descending = false)
      .groupBy($"term")
      .agg(array_join(sort_array(collect_list($"doc_id")), ",").as("postings"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    dfCounts.join(page, Seq("term")).crossJoin(broadcast(n))
      .filter($"df" >= ceil(lit(IndexMinDfShare).cast("double") * $"n_docs"))
      .select($"term", $"df", $"postings")
      .orderBy($"df".desc, $"term")
  }

  val invertedIndexSql: String =
    s"""WITH grain AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT doc_id,
       |      unnest(regexp_extract_all(lower(text), '$TfidfTermRegex')) AS term
       |    FROM documents)),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |agg AS (
       |  SELECT term, count(*) AS df,
       |    array_to_string(list_sort(list(doc_id))[1:$IndexPostingsCap], ',') AS postings
       |  FROM grain GROUP BY term)
       |SELECT term, df, postings FROM agg
       |WHERE df >= CEIL(CAST($IndexMinDfShare AS DOUBLE) * (SELECT n_docs FROM n))
       |ORDER BY df DESC, term""".stripMargin

  /** Language-ID confusion matrix: labeled lang vs stopword-heuristic
    * prediction.
    *
    * The per-language hit counts are materialized in their own projection
    * and the argmax chain runs over the bound columns: inlined (as in
    * [[TextFunctions.langId]], which stays as the single-Column API), the
    * chain re-evaluates every regexp_count 3-4x per row — this shape cut
    * the query from 7.7s to ~2s at sf0.1.
    */
  // The language-ID argmax, ONE definition per engine shared by
  // langIdConfusion and corpusCuration so the composed query can never
  // drift from the standalone one: per-language hit-count columns over a
  // pre-lowered __lt column (materialized in their own projection — see
  // langIdConfusion's doc for why), and the DuckDB CASE chain generated
  // from the same LangStopwords/hitPattern constants. The trailing
  // ELSE 'und' only fires for NULL text (a non-null text always matches
  // some WHEN; Spark's when(null-cond).otherwise chain lands on 'und' for
  // NULL too, so the engines agree even off the non-null corpora).
  private def langCountCols: Seq[Column] = LangStopwords.map { case (lang, words) =>
    wordHits(col("__lt"), words).as(s"__c_$lang")
  }
  private def langBound: Seq[(String, Column)] =
    LangStopwords.map { case (lang, _) => lang -> col(s"__c_$lang") }
  private val langPredSqlExpr: String = {
    val counts = LangStopwords.map { case (lang, words) =>
      lang -> s"len(regexp_extract_all(lower(text), '${hitPattern(words)}'))"
    }
    val total = counts.map(_._2).mkString(" + ")
    val maxOf = s"greatest(${counts.map(_._2).mkString(", ")})"
    val chain = counts.map { case (lang, c) =>
      s"WHEN $c = $maxOf THEN '$lang'"
    }.mkString(" ")
    s"CASE WHEN ($total) = 0 THEN 'und' $chain ELSE 'und' END"
  }

  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "documents")
      .select($"lang", lower($"text").as("__lt"))
      .select(Seq($"lang") ++ langCountCols: _*)
      .select($"lang", langIdFromCounts(langBound).as("predicted"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  val langIdConfusionSql: String =
    s"""SELECT lang, predicted, count(*) AS n FROM (
       |  SELECT lang, $langPredSqlExpr AS predicted
       |  FROM documents)
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

  /** Per-document quality heuristics (pretraining-corpus filter shape). */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nt = tokenCount($"text")
    val alpha = length(regexp_replace($"text", "\\s", ""))
    Tables.wide(spark, dir, "documents")
      .select($"doc_id",
        nt.cast("long").as("n_tokens"),
        round(punctCount($"text").cast("double") / nullif(length($"text").cast("double"), lit(0.0)), 4)
          .as("punct_ratio"),
        round(stopwordHits($"text").cast("double") / nullif(nt.cast("double"), lit(0.0)), 4)
          .as("stopword_ratio"),
        round(alpha.cast("double") / nullif(nt.cast("double"), lit(0.0)), 4)
          .as("avg_token_len"),
        when(nt < 20, "short").when(punctCount($"text") > nt, "noisy").otherwise("ok")
          .as("quality_label"))
      .orderBy($"doc_id")
  }

  val qualityScoresSql: String = {
    val nt = "len(regexp_extract_all(text, '\\S+'))"
    val punct = "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"
    val stop = "len(regexp_extract_all(lower(text), " +
      s"'\\b(${LangStopwords.flatMap(_._2).filterNot(_.exists(_ > 127)).mkString("|")})\\b'))"
    s"""SELECT doc_id,
       |  CAST($nt AS BIGINT) AS n_tokens,
       |  round(CAST($punct AS DOUBLE) / nullif(CAST(length(text) AS DOUBLE), 0.0), 4) AS punct_ratio,
       |  round(CAST($stop AS DOUBLE) / nullif(CAST($nt AS DOUBLE), 0.0), 4) AS stopword_ratio,
       |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / nullif(CAST($nt AS DOUBLE), 0.0), 4) AS avg_token_len,
       |  CASE WHEN $nt < 20 THEN 'short' WHEN $punct > $nt THEN 'noisy' ELSE 'ok' END AS quality_label
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Lexicon sentiment distribution with shares (SURVEY §2.6 A4+A8 over
    * §2.4 E4's deterministic stand-in).
    *
    * Label casing rule (reference parity, utils.py:82,92): null/empty
    * text buckets as the VERBATIM uppercase 'NEUTRAL' — the reference's
    * classify_sentiment empty/error fallback — distinct from the
    * lowercase model-vocabulary tie label 'neutral'. A distribution
    * diffed against a reference-produced store therefore buckets error
    * rows identically. The gate corpus has no empty texts, so the
    * 'NEUTRAL' row appears only on corpora that do (the oracle carries
    * the same rule either way).
    */
  def sentimentDistribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dist = Tables.wide(spark, dir, "documents")
      .select(LexiconSentiment.label($"text", EngineWords).as("sentiment_label"),
        LexiconSentiment.confidence($"text", EngineWords).as("conf"))
      .groupBy($"sentiment_label")
      .agg(count(lit(1)).as("n"), round(avg($"conf"), 4).as("avg_confidence"))
    // share-of-total via a broadcast single-row total, not a global window:
    // same result on the (bounded) distribution, but no empty-partition
    // WindowExec (which moves its input to one partition and warns)
    dist.crossJoin(broadcast(dist.agg(sum($"n").as("__total"))))
      .withColumn("share", round($"n" / $"__total", 4))
      .drop("__total")
      .orderBy($"sentiment_label")
  }

  val sentimentDistributionSql: String = {
    val p = s"len(regexp_extract_all(lower(text), '\\b(${EngineWords.positive.mkString("|")})\\b'))"
    val n = s"len(regexp_extract_all(lower(text), '\\b(${EngineWords.negative.mkString("|")})\\b'))"
    s"""SELECT sentiment_label, n, avg_confidence, round(n / sum(n) OVER (), 4) AS share FROM (
       |  SELECT sentiment_label, count(*) AS n, round(avg(conf), 4) AS avg_confidence FROM (
       |    SELECT CASE WHEN text IS NULL OR length(text) = 0 THEN '${LexiconSentiment.FallbackLabel}'
       |                WHEN $p > $n THEN 'positive' WHEN $n > $p THEN 'negative' ELSE 'neutral' END AS sentiment_label,
       |      coalesce(CAST(abs($p - $n) AS DOUBLE) / nullif(CAST(($p + $n) AS DOUBLE), 0.0), 0.0) AS conf
       |    FROM documents)
       |  GROUP BY sentiment_label)
       |ORDER BY sentiment_label""".stripMargin
  }

  /** Rolling-hash document fingerprints (Karp–Rabin fold). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "documents")
      .select($"doc_id", fingerprint(lower($"text")).as("fp"))
      .orderBy($"doc_id")
  }

  val fingerprintsSql: String =
    """SELECT doc_id,
      |  CASE WHEN length(text) = 0 THEN 0 ELSE list_reduce(
      |    [CAST(unicode(c) AS BIGINT) for c in string_split(lower(text), '')],
      |    (acc, x) -> (acc * 31 + x) % 1000000007) END AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Dictionary location detection (E1 cascade) over the engine-topic
    * dictionary, rolled up to a distribution.
    */
  def topicLocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val det = DictionaryLocator.detect($"text", DictionaryLocator.EngineTopics)
    Tables.wide(spark, dir, "documents")
      .select(coalesce(det.getField("province"), lit("unknown")).as("province"),
        coalesce(det.getField("city"), lit("unknown")).as("city"),
        coalesce(det.getField("detected_from"), lit("none")).as("detected_from"))
      .groupBy($"province", $"city", $"detected_from")
      .agg(count(lit(1)).as("n"))
      .orderBy($"province", $"city", $"detected_from")
  }

  val topicLocationSql: String = {
    // Same separator→space preprocessing as DictionaryLocator.detect
    // (utils.py:358-362). EngineTopics has only single-word cities, so the
    // reference's province-major first-exact-else-last-token cascade
    // degenerates to this flat city-then-province CASE in dictionary order.
    val t = "translate(lower(text), '-/\\|_,;.', '        ')"
    val whens = DictionaryLocator.EngineTopics.cities.map { case (p, c) =>
      s"WHEN regexp_matches($t, '\\b$c\\b') THEN struct_pack(province := '$p', city := '$c', detected_from := 'city_match')"
    } ++ DictionaryLocator.EngineTopics.provinces.map { p =>
      s"WHEN regexp_matches($t, '\\b$p\\b') THEN struct_pack(province := '$p', city := CAST(NULL AS VARCHAR), detected_from := 'province_match')"
    }
    s"""SELECT coalesce(det.province, 'unknown') AS province,
       |  coalesce(det.city, 'unknown') AS city,
       |  coalesce(det.detected_from, 'none') AS detected_from,
       |  count(*) AS n
       |FROM (SELECT CASE ${whens.mkString(" ")} END AS det FROM documents)
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** F4/F5/F6 + P6 (the scraper's parse-level extraction ops,
    * src/resilient_scraper.py:404-479) over deterministic synthesized
    * hrefs/button texts: status-URL filtering (photo/video links dropped),
    * tweet-id and handle extraction, digit-run metric extraction with its
    * 0 default, and the 512-char classifier clip.
    */
  def extractions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val href = when($"doc_id" % 10 === 0,
        concat(lit("https://x.com/u"), $"doc_id", lit("/status/"), $"doc_id" + 100000, lit("/photo/1")))
      .when($"doc_id" % 10 === 5,
        concat(lit("https://x.com/u"), $"doc_id", lit("/video/2")))
      .otherwise(
        concat(lit("https://x.com/u"), $"doc_id", lit("/status/"), $"doc_id" + 100000))
    val btn = when($"doc_id" % 7 === 0, lit("reply"))
      .otherwise(concat(lit("replies "), $"doc_id" % 53))
    Tables.wide(spark, dir, "documents")
      .select($"doc_id", href.as("href"), btn.as("btn"), $"text")
      .filter(isStatusUrl($"href"))
      .select($"doc_id",
        tweetIdFromUrl($"href").as("tweet_id"),
        handleFromUrl($"href").as("author_handle"),
        countFromText($"btn").as("reply_count"),
        length(truncate512($"text")).as("clip_len"))
      .orderBy($"doc_id")
  }

  val extractionsSql: String =
    """WITH synth AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 10 = 0 THEN 'https://x.com/u' || doc_id || '/status/' || (doc_id + 100000) || '/photo/1'
      |         WHEN doc_id % 10 = 5 THEN 'https://x.com/u' || doc_id || '/video/2'
      |         ELSE 'https://x.com/u' || doc_id || '/status/' || (doc_id + 100000) END AS href,
      |    CASE WHEN doc_id % 7 = 0 THEN 'reply' ELSE 'replies ' || (doc_id % 53) END AS btn
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_extract(href, '/status/([^/?]+)', 1) AS tweet_id,
      |  regexp_extract(href, '/([^/]+)/status/', 1) AS author_handle,
      |  CAST(coalesce(nullif(regexp_extract(btn, '\d+', 0), ''), '0') AS INT) AS reply_count,
      |  CAST(length(substr(text, 1, 512)) AS INT) AS clip_len
      |FROM synth
      |WHERE href LIKE '%/status/%'
      |  AND lower(href) NOT LIKE '%photo%' AND lower(href) NOT LIKE '%video%'
      |ORDER BY doc_id""".stripMargin

  /** E2 fuzzy location detection ([[graft.operators.FuzzyLocator]]):
    * token-explode + broadcast levenshtein join + best-match window, over
    * the engine-topic dictionary.
    */
  def fuzzyLocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.FuzzyLocator.detect(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text",
      DictionaryLocator.EngineTopics, threshold = 0.7)
      .orderBy($"id")
  }

  val fuzzyLocationSql: String = {
    val dimRows = (DictionaryLocator.EngineTopics.cities.zipWithIndex.flatMap {
      case ((p, c), i) => c.toLowerCase.split("\\s+").filter(_.length > 2)
        .map(tok => s"('$tok', '$p', '$c', 0, $i)")
    } ++ DictionaryLocator.EngineTopics.provinces.zipWithIndex.flatMap {
      case (p, i) => p.toLowerCase.split("\\s+").filter(_.length > 2)
        .map(tok => s"('$tok', '$p', CAST(NULL AS VARCHAR), 1, $i)")
    }).mkString(",\n      |    ")
    s"""WITH dim(name_tok, province, city, kind, priority) AS (VALUES
       |    $dimRows),
       |toks AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS t
       |    FROM documents)
       |  WHERE length(t) > 2),
       |scored AS (
       |  SELECT doc_id, province, city, kind, priority,
       |    1.0 - CAST(levenshtein(t, name_tok) AS DOUBLE) /
       |      greatest(length(t), length(name_tok)) AS sim
       |  FROM toks CROSS JOIN dim)
       |SELECT doc_id AS id, province, city, round(sim, 4) AS similarity
       |FROM (SELECT * FROM scored WHERE sim >= 0.7)
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY kind, sim DESC, priority) = 1
       |ORDER BY id""".stripMargin
  }

  /** E2's partial-ratio variant ([[graft.operators.FuzzyLocator.detectPartialRatio]])
    * over the engine-topic dictionary, scored against a bounded 120-char
    * text prefix (the windowed scan is O(|text|·|name|²) per pair — the
    * prefix keeps the parity-grade path priced like the reference's own
    * per-row loop). Every dictionary name — city (kind 0) AND province
    * (kind 1) — is scored; selection is (kind, score desc, dictionary
    * order), the reference's city-first strict-> semantics. The oracle
    * reproduces the m-1/m/m+1 window sweep with DuckDB levenshtein;
    * document texts (min 44 chars) are always longer than every name, so
    * the shorter/longer swap never triggers on either engine and the
    * window formulas align exactly.
    */
  def fuzzyPartialRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.wide(spark, dir, "documents")
      .select($"doc_id", substring($"text", 1, 120).as("t"))
    graft.operators.FuzzyLocator.detectPartialRatio(
      docs, $"doc_id", $"t", DictionaryLocator.EngineTopics, threshold = 0.7)
      .orderBy($"id")
  }

  val fuzzyPartialRatioSql: String = {
    val dict = DictionaryLocator.EngineTopics
    val rows = (dict.cities.zipWithIndex.map { case ((p, c), i) =>
      s"('${c.toLowerCase}', '$p', '$c', 0, $i)"
    } ++ dict.provinces.zipWithIndex.map { case (p, i) =>
      s"('${p.toLowerCase}', '$p', CAST(NULL AS VARCHAR), 1, $i)"
    }).mkString(",\n      |    ")
    s"""WITH dim(name, province, city, kind, prio) AS (VALUES
       |    $rows),
       |scored AS (
       |  SELECT d.doc_id, dim.province, dim.city, dim.kind, dim.prio,
       |    round(100 * (1 - list_min(flatten([
       |      [levenshtein(dim.name, substr(d.t, i, wl)) / greatest(len(dim.name), wl)
       |       for i in range(1, greatest(len(d.t) - wl + 1, 1) + 1)]
       |      for wl in [greatest(len(dim.name) - 1, 1), len(dim.name), len(dim.name) + 1]])))) AS score
       |  FROM (SELECT doc_id, lower(substr(text, 1, 120)) AS t FROM documents) d CROSS JOIN dim)
       |SELECT doc_id AS id, province, city, score FROM scored
       |WHERE score >= 70
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY kind, score DESC, prio) = 1
       |ORDER BY id""".stripMargin
  }

  /** The E1 cascade via the broadcast n-gram join
    * ([[DictionaryLocator.detectViaJoin]]) — the scale path for the full
    * production dictionary, rolled up like q_topic_location. Its oracle
    * mirrors the TOKEN-equality semantics (the join path's contract),
    * not the regex chain.
    */
  def topicLocationJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.wide(spark, dir, "documents")
    val det = DictionaryLocator.detectViaJoin(
      docs, $"doc_id", $"text", DictionaryLocator.EngineTopics)
      .withColumnRenamed("id", "doc_id")
    docs.select($"doc_id").join(det, Seq("doc_id"), "left")
      .groupBy(
        coalesce($"province", lit("unknown")).as("province"),
        coalesce($"city", lit("unknown")).as("city"),
        coalesce($"detected_from", lit("none")).as("detected_from"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"province", $"city", $"detected_from")
  }

  val topicLocationJoinSql: String = {
    val dict = DictionaryLocator.EngineTopics
    val dimRows = (dict.entries.zipWithIndex.flatMap { case ((p, cities), ip) =>
      cities.zipWithIndex.map { case (c, ic) =>
        s"('${c.toLowerCase}', 0, $ip, 0, $ic, '$p', '$c', 'city_match')"
      } // EngineTopics cities are single-word: no token rows
    } ++ dict.provinces.zipWithIndex.map { case (p, ip) =>
      s"('${p.toLowerCase}', 1, $ip, 0, 0, '$p', CAST(NULL AS VARCHAR), 'province_match')"
    }).mkString(",\n      |    ")
    val t = "translate(lower(text), '-/\\|_,;.', '        ')"
    s"""WITH dim(m, stage, ip, kind, ick, province, city, detected_from) AS (VALUES
       |    $dimRows),
       |toks AS (
       |  SELECT DISTINCT doc_id, m FROM (
       |    SELECT doc_id, unnest(regexp_extract_all($t, '\\S+')) AS m FROM documents)),
       |best AS (
       |  SELECT doc_id, province, city, detected_from FROM (
       |    SELECT t.doc_id, d.province, d.city, d.detected_from,
       |      row_number() OVER (PARTITION BY t.doc_id
       |        ORDER BY d.stage, d.ip, d.kind, d.ick) AS rn
       |    FROM toks t JOIN dim d ON t.m = d.m)
       |  WHERE rn = 1)
       |SELECT coalesce(b.province, 'unknown') AS province,
       |  coalesce(b.city, 'unknown') AS city,
       |  coalesce(b.detected_from, 'none') AS detected_from,
       |  count(*) AS n
       |FROM documents doc LEFT JOIN best b ON doc.doc_id = b.doc_id
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Composed corpus-curation pipeline — the end-to-end training-data prep
    * run a large-corpus user actually chains: exact dedup on the
    * Python-strip normalized text (the reference's key,
    * src/resilient_scraper.py:354), stopword language ID, the
    * [[qualityScores]] keep rule (>= 20 tokens, punct <= tokens), then a
    * per-detected-language summary. Shuffle shape at 100 TB: ONE exchange
    * on the dedup key, then a map-side-combined hash agg over a handful of
    * language groups — nothing else moves. The oracle is generated from
    * the SAME LangStopwords/hitPattern/PyWsRe2Class constants as the
    * component queries, so the composition can never drift from its parts.
    */
  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // payload = text only: downstream scoring needs nothing else, and the
    // payload is what the dedup aggregate buffers and shuffles
    val deduped = graft.operators.Dedup.exact(
      Tables.wide(spark, dir, "documents"),
      lower(TextFunctions.pyStrip($"text")), $"doc_id",
      payload = Seq("text"))
    deduped
      .select($"text", lower($"text").as("__lt"))
      .select(Seq(
        tokenCount($"text").cast("long").as("__nt"),
        punctCount($"text").cast("long").as("__np")) ++ langCountCols: _*)
      .select($"__nt", $"__np", langIdFromCounts(langBound).as("lang_pred"))
      .withColumn("__ok", $"__nt" >= 20 && $"__np" <= $"__nt")
      .groupBy($"lang_pred")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"__ok", 1L).otherwise(0L)).as("n_kept"),
        round(avg(when($"__ok", $"__nt")), 4).as("avg_tokens_kept"))
      .withColumn("kept_share", round($"n_kept".cast("double") / $"n_docs", 4))
      .orderBy($"lang_pred")
  }

  val corpusCurationSql: String = {
    val ws = TextFunctions.PyWsRe2Class
    val nt = "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)"
    val np = "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT)"
    s"""WITH deduped AS (
       |  SELECT doc_id, text FROM documents
       |  QUALIFY row_number() OVER (
       |    PARTITION BY lower(regexp_replace(text, '^$ws+|$ws+$$', '', 'g'))
       |    ORDER BY doc_id) = 1),
       |scored AS (
       |  SELECT $nt AS nt, $np AS np, $langPredSqlExpr AS lang_pred
       |  FROM deduped)
       |SELECT lang_pred, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN nt >= 20 AND np <= nt THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(avg(CASE WHEN nt >= 20 AND np <= nt THEN CAST(nt AS DOUBLE) END), 4) AS avg_tokens_kept,
       |  round(CAST(sum(CASE WHEN nt >= 20 AND np <= nt THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS kept_share
       |FROM scored GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
  }

  /** Bigram-LM geometry for the registered query (the operator's caps are
    * parameters; these are the registered values the oracle mirrors).
    */
  private val LmVocabSize = 4096
  private val LmMaxBigrams = 1 << 16

  /** Per-doc mean scaled log-prob below this flags a low-fluency doc.
    * The comparison runs in EXACT integer space (`lp_scaled < thr * nb`),
    * so the gate can never flip on a float rounding boundary.
    */
  private val LmLowScaled = -34500000L // ln p per bigram < -3.45

  /** Bigram-LM fluency summary per source — the CCNet-style perplexity
    * quality filter (see [[graft.operators.NgramLm]] for the scale
    * contract: bounded broadcast LM, zero-shuffle scoring, integer-exact
    * log-prob sums). avg_logp is bigram-weighted (ratio of two exact
    * integer sums); min/max are over per-doc means, each an identical
    * double division in both engines.
    */
  def bigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r17: tokenize ONCE into a size-gated scratch checkpoint — train's
    // unigram pass, train's bigram pass and the scoring pass each re-ran
    // the corpus regex AND the widen exchange before (probe: three
    // 1-task ~830 KB text exchanges + three regexp_extract_all scans per
    // run); NgramLm passes a pre-tokenized array column straight through
    val docs = Tables.wide(spark, dir, "documents")
    val toks = graft.operators.Checkpoints.materializeScratch(
      docs.select($"doc_id", $"source",
        regexp_extract_all(lower($"text"),
          lit(graft.operators.NgramLm.TokenRegex), lit(0)).as("__l")))
    val lm = graft.operators.NgramLm.train(toks, "__l", LmVocabSize, LmMaxBigrams)
    graft.operators.NgramLm.score(toks, "__l", lm, idCols = Seq("doc_id", "source"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        count($"lp_scaled").as("n_scored"),
        sum($"n_bigrams").cast("long").as("n_bigrams"),
        round(sum($"lp_scaled").cast("double") / sum($"n_bigrams") /
          graft.operators.NgramLm.LpScale, 4).as("avg_logp"),
        round(min($"lp_scaled".cast("double") / $"n_bigrams") /
          graft.operators.NgramLm.LpScale, 4).as("min_doc_logp"),
        round(max($"lp_scaled".cast("double") / $"n_bigrams") /
          graft.operators.NgramLm.LpScale, 4).as("max_doc_logp"),
        sum(when($"lp_scaled" < lit(LmLowScaled) * $"n_bigrams", 1L)
          .otherwise(0L)).as("n_low"))
      .orderBy($"source")
  }

  val bigramLmSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    regexp_extract_all(lower(text), '${graft.operators.NgramLm.TokenRegex}') AS l
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, source, u.i AS i, l[u.i] AS t
       |  FROM toks, unnest(range(1, len(l) + 1)) AS u(i)),
       |c1 AS (SELECT t AS w, count(*) AS c FROM pos GROUP BY t),
       |vocab AS (SELECT w FROM c1 ORDER BY c DESC, w LIMIT $LmVocabSize),
       |vtot AS (SELECT count(*) + 1 AS v FROM vocab),
       |mp AS (SELECT p.doc_id, p.source, p.i,
       |         CASE WHEN v.w IS NULL THEN '${graft.operators.NgramLm.Unk}' ELSE p.t END AS m
       |       FROM pos p LEFT JOIN vocab v ON v.w = p.t),
       |big AS (SELECT a.doc_id, a.source, a.m AS w1, b.m AS w2
       |        FROM mp a JOIN mp b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       |c2 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
       |blm AS (SELECT w1, w2, c FROM c2 ORDER BY c DESC, w1, w2 LIMIT $LmMaxBigrams),
       |hist AS (SELECT w1, CAST(sum(c) AS BIGINT) AS h FROM c2 GROUP BY w1),
       |term AS (SELECT g.doc_id, g.source,
       |           CAST(round(ln((coalesce(b.c, 0) + 1.0) /
       |             (coalesce(h.h, 0) + (SELECT v FROM vtot))) *
       |             ${graft.operators.NgramLm.LpScale}, 0) AS BIGINT) AS lp
       |         FROM big g LEFT JOIN blm b ON b.w1 = g.w1 AND b.w2 = g.w2
       |                    LEFT JOIN hist h ON h.w1 = g.w1),
       |docsc AS (SELECT doc_id, source, CAST(sum(lp) AS BIGINT) AS s,
       |            CAST(count(*) AS BIGINT) AS nb
       |          FROM term GROUP BY doc_id, source),
       |base AS (SELECT d.doc_id, d.source, s.s, s.nb
       |         FROM documents d LEFT JOIN docsc s ON s.doc_id = d.doc_id)
       |SELECT source, count(*) AS n_docs, count(s) AS n_scored,
       |  CAST(sum(nb) AS BIGINT) AS n_bigrams,
       |  round(CAST(sum(s) AS DOUBLE) / sum(nb) / ${graft.operators.NgramLm.LpScale}, 4) AS avg_logp,
       |  round(min(CAST(s AS DOUBLE) / nb) / ${graft.operators.NgramLm.LpScale}, 4) AS min_doc_logp,
       |  round(max(CAST(s AS DOUBLE) / nb) / ${graft.operators.NgramLm.LpScale}, 4) AS max_doc_logp,
       |  CAST(sum(CASE WHEN s < $LmLowScaled * nb THEN 1 ELSE 0 END) AS BIGINT) AS n_low
       |FROM base GROUP BY source ORDER BY source""".stripMargin

  /** Naive-Bayes geometry + split boundary for the registered query. The
    * content-hash split (md5 hex first char ≤ 'b' → train, 12/16 = 75 %)
    * is the [[CurationQueries]] dataset-split discipline: membership is a
    * pure function of the doc id, reproducible in any engine.
    */
  private val NbVocabSize = 4096
  private val NbSplitBound = "b"

  /** Learned language-ID confusion matrix — multinomial naive Bayes
    * trained on the 75 % content-hash split and evaluated on the held-out
    * 25 %, entirely in-engine (see [[graft.ml.NaiveBayes]] for the scale
    * contract: two-pass bounded training, broadcast dense matrix,
    * integer-exact argmax). Complements q_langid_confusion: that gate
    * checks a FIXED stopword heuristic, this one checks a TRAINED
    * classifier end-to-end — training arithmetic, model materialization,
    * scoring fan-out, argmax tiebreaks — under the same external oracle.
    */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r17: tokenize once into a size-gated scratch checkpoint — train's
    // vocab pass, train's count pass and the predict pass each re-ran the
    // corpus regex before (the q_bigram_lm three-pass shape)
    val docs = graft.operators.Checkpoints.materializeScratch(
      Tables.wide(spark, dir, "documents")
        .select($"doc_id", $"lang",
          substring(md5($"doc_id".cast("string")), 1, 1).as("__hb"),
          regexp_extract_all(lower($"text"),
            lit(graft.operators.NgramLm.TokenRegex), lit(0)).as("__l")))
    val model = graft.ml.NaiveBayes.train(
      docs.filter($"__hb" <= NbSplitBound), "__l", "lang", NbVocabSize)
    graft.ml.NaiveBayes.predict(
        docs.filter($"__hb" > NbSplitBound), "__l", model,
        idCols = Seq("doc_id", "lang"))
      .groupBy($"lang".as("actual"), $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"actual", $"predicted")
  }

  val nbConfusionSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, lang,
       |    regexp_extract_all(lower(text), '${graft.operators.NgramLm.TokenRegex}') AS l,
       |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hb
       |  FROM documents),
       |train AS (SELECT * FROM base WHERE hb <= '$NbSplitBound'),
       |test AS (SELECT * FROM base WHERE hb > '$NbSplitBound'),
       |ttoks AS (SELECT lang, u.tok AS t
       |          FROM train, unnest(l) AS u(tok)),
       |c1 AS (SELECT t, count(*) AS c FROM ttoks GROUP BY t),
       |vocab AS (SELECT t FROM c1 ORDER BY c DESC, t LIMIT $NbVocabSize),
       |vlist AS (SELECT t FROM vocab UNION ALL SELECT '${graft.operators.NgramLm.Unk}'),
       |vsz AS (SELECT count(*) AS v FROM vlist),
       |mt AS (SELECT k.lang, coalesce(v.t, '${graft.operators.NgramLm.Unk}') AS m
       |       FROM ttoks k LEFT JOIN vocab v ON v.t = k.t),
       |cc AS (SELECT lang, m, count(*) AS c FROM mt GROUP BY lang, m),
       |nc AS (SELECT lang, count(*) AS n FROM mt GROUP BY lang),
       |classes AS (SELECT DISTINCT lang FROM train),
       |matrix AS (SELECT cl.lang AS cls, vl.t AS m,
       |             CAST(round(ln((coalesce(cc.c, 0) + 1.0) /
       |               (coalesce(nc.n, 0) + (SELECT v FROM vsz))) *
       |               ${graft.operators.NgramLm.LpScale}, 0) AS BIGINT) AS lp
       |           FROM classes cl CROSS JOIN vlist vl
       |           LEFT JOIN nc ON nc.lang = cl.lang
       |           LEFT JOIN cc ON cc.lang = cl.lang AND cc.m = vl.t),
       |priors AS (SELECT lang AS cls,
       |             CAST(round(ln(CAST(count(*) AS DOUBLE) /
       |               (SELECT count(*) FROM train)) *
       |               ${graft.operators.NgramLm.LpScale}, 0) AS BIGINT) AS pr
       |           FROM train GROUP BY lang),
       |stoks AS (SELECT s.doc_id, s.lang, coalesce(v.t, '${graft.operators.NgramLm.Unk}') AS m
       |          FROM (SELECT doc_id, lang, u.tok AS t
       |                FROM test, unnest(l) AS u(tok)) s
       |          LEFT JOIN vocab v ON v.t = s.t),
       |sc AS (SELECT s.doc_id, s.lang AS actual, x.cls,
       |         CAST(sum(x.lp) AS BIGINT) + min(p.pr) AS score
       |       FROM stoks s JOIN matrix x ON x.m = s.m
       |                    JOIN priors p ON p.cls = x.cls
       |       GROUP BY s.doc_id, s.lang, x.cls),
       |pred AS (SELECT doc_id, actual, cls AS predicted FROM sc
       |         QUALIFY row_number() OVER (
       |           PARTITION BY doc_id ORDER BY score DESC, cls) = 1)
       |SELECT actual, predicted, count(*) AS n
       |FROM pred GROUP BY actual, predicted
       |ORDER BY actual, predicted""".stripMargin

  // ---------------------------------------------------- q_stemmed_terms

  /** Top stemmed-vocabulary counts under the simplified Indonesian
    * stemmer ([[org.apache.spark.sql.graft.StemIndonesianExpr]] — the
    * reference corpus IS Indonesian tweets, so affix-folding is the
    * domain-correct vocabulary normalization for retrieval/TF-IDF). The
    * DuckDB oracle replays the full rule cascade as a lateral CASE
    * chain GENERATED from the expression's own rule tables — the
    * shared-constant discipline, so the two engines cannot drift on a
    * single affix rule.
    */
  def stemmedTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "documents")
      .select(explode(
        regexp_extract_all(lower($"text"), lit(TfidfTermRegex), lit(0))).as("term"))
      .select(org.apache.spark.sql.graft.StemIndonesianExpr
        .stemIndonesian($"term").as("stem"))
      .groupBy($"stem").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"stem")
      .limit(40)
      .orderBy($"n".desc, $"stem")
  }

  val stemmedTermsSql: String = {
    import org.apache.spark.sql.graft.StemIndonesian._
    def sufCase(e: String, sufs: Seq[String], min: Int): String =
      "CASE " + sufs.map { s =>
        s"WHEN length($e) >= ${s.length + min} AND " +
          s"substr($e, length($e) - ${s.length - 1}) = '$s' " +
          s"THEN substr($e, 1, length($e) - ${s.length})"
      }.mkString(" ") + s" ELSE $e END"
    def preCase(e: String, pres: Seq[String]): String =
      "CASE " + pres.map { p =>
        s"WHEN length($e) >= ${p.length + minStem} AND " +
          s"substr($e, 1, ${p.length}) = '$p' THEN substr($e, ${p.length + 1})"
      }.mkString(" ") + s" ELSE $e END"
    // each stage is its own MATERIALIZED CTE: lateral column aliases
    // (and plain CTEs) get macro-inlined per reference, and a 16-branch
    // CASE referencing its predecessor ~50 times across 5 levels
    // explodes combinatorially at plan time — materialization keeps the
    // cascade linear
    s"""WITH toks AS MATERIALIZED (
       |  SELECT unnest(regexp_extract_all(lower(text), '$TfidfTermRegex')) AS t0
       |  FROM documents),
       |s1 AS MATERIALIZED (SELECT ${sufCase("t0", particleRules, minStem)} AS t1 FROM toks),
       |s2 AS MATERIALIZED (SELECT ${sufCase("t1", possessiveRules, minStem)} AS t2 FROM s1),
       |s3 AS MATERIALIZED (SELECT t2, ${preCase("t2", prefixRules)} AS t3 FROM s2),
       |s4 AS MATERIALIZED (
       |  SELECT CASE WHEN t3 <> t2 THEN ${preCase("t3", prefixRules)}
       |              ELSE t3 END AS t4 FROM s3),
       |st AS MATERIALIZED (SELECT ${sufCase("t4", suffixRules, minSuffixStem)} AS stem FROM s4)
       |SELECT stem, count(*) AS n FROM st GROUP BY stem
       |ORDER BY n DESC, stem LIMIT 40""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stemmed_terms" -> (stemmedTerms _),
    "q_nb_confusion" -> (nbConfusion _),
    "q_bigram_lm" -> (bigramLm _),
    "q_corpus_curation" -> (corpusCuration _),
    "q_topic_location_join" -> (topicLocationJoin _),
    "q_extractions" -> (extractions _),
    "q_fuzzy_location" -> (fuzzyLocation _),
    "q_fuzzy_partial_ratio" -> (fuzzyPartialRatio _),
    "q_clean_text" -> (cleanText _),
    "q_token_stats" -> (tokenStats _),
    "q_token_heavy_hitters" -> (tokenHeavyHitters _),
    "q_tfidf_terms" -> (tfidfTerms _),
    "q_inverted_index" -> (invertedIndex _),
    "q_langid_confusion" -> (langIdConfusion _),
    "q_quality_scores" -> (qualityScores _),
    "q_sentiment_distribution" -> (sentimentDistribution _),
    "q_fingerprints" -> (fingerprints _),
    "q_topic_location" -> (topicLocation _))

  val oracles: Map[String, String] = Map(
    "q_stemmed_terms" -> stemmedTermsSql,
    "q_nb_confusion" -> nbConfusionSql,
    "q_bigram_lm" -> bigramLmSql,
    "q_corpus_curation" -> corpusCurationSql,
    "q_topic_location_join" -> topicLocationJoinSql,
    "q_extractions" -> extractionsSql,
    "q_fuzzy_location" -> fuzzyLocationSql,
    "q_fuzzy_partial_ratio" -> fuzzyPartialRatioSql,
    "q_clean_text" -> cleanTextSql,
    "q_token_stats" -> tokenStatsSql,
    "q_token_heavy_hitters" -> tokenHeavyHittersSql,
    "q_tfidf_terms" -> tfidfTermsSql,
    "q_inverted_index" -> invertedIndexSql,
    "q_langid_confusion" -> langIdConfusionSql,
    "q_quality_scores" -> qualityScoresSql,
    "q_sentiment_distribution" -> sentimentDistributionSql,
    "q_fingerprints" -> fingerprintsSql,
    "q_topic_location" -> topicLocationSql)
}
