package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DictionaryLocator, LexiconSentiment}
import graft.operators.TweetOps
import graft.pipeline.IngestJob

/** E3-composed-pipeline query: drives the REAL ingest transform chain
  * (nest -> apply_data_cleaning -> apply_sentiment_labeling, the code path
  * used by [[graft.pipeline.IngestJob]]) over tweets synthesized
  * deterministically from the `documents` table, then rolls the result up.
  * The DuckDB oracle re-derives every stamped column from first principles,
  * so a drift anywhere in the composed chain (cleaning, location cascade,
  * sentiment, P4 stamping) breaks the hash match.
  */
object PipelineQueries {

  private val FixedNow = "2025-06-01 10:00:00"

  /** documents -> raw-scrape-shaped records (deterministic metadata). */
  private def syntheticRaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents").select(
      $"doc_id".cast("string").as("_id"),
      $"text",
      lit("").as("author_name"),
      concat(lit("user"), $"doc_id").as("author_handle"),
      expr("CAST(date_add(DATE'2025-05-01', CAST(doc_id % 28 AS INT)) AS STRING)")
        .as("created_at"),
      lit(null).cast("string").as("location"),
      concat(lit("https://x.com/u/status/"), $"doc_id").as("tweet_url"),
      struct(lit(0).as("reply_count"), lit(0).as("retweet_count"),
        lit(0).as("like_count")).as("metrics"))
  }

  def tweetPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val job = IngestJob(DictionaryLocator.EngineTopics, LexiconSentiment.EngineWords)
    val processed = job.transform(
      syntheticRaw(spark, dir), to_timestamp(lit(FixedNow)))
    processed
      .withColumn("__unproc", when(
        $"content.clean_text".isNull || $"sentiment_analysis.label".isNull ||
          $"location".isNull || $"location.detected_from".isNull, 1L).otherwise(0L))
      .groupBy(
        coalesce($"location.province", lit("unknown")).as("province"),
        $"sentiment_analysis.label".as("sentiment_label"))
      .agg(
        count(lit(1)).as("n"),
        round(avg($"sentiment_analysis.confidence_score"), 4).as("avg_confidence"),
        sum($"__unproc").as("n_unprocessed"))
      .orderBy($"province", $"sentiment_label")
  }

  // Shared oracle fragments — ONE definition each so the two oracles can
  // never drift apart:
  // F1 cleaning chain (utils.py:28-50) over the raw text.
  private val cleanSqlFragment =
    """lower(trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    text, 'http\S+|www\S+|https\S+', '', 'g'), '@\w+', '[MENTION]', 'g'),
      |    '#\w+', '[HASHTAG]', 'g'), '\s+', ' ', 'g')))""".stripMargin

  // E4 hit counts over substr(clean_text, 1, 512) with the engine lexicon.
  private def hitCountSql(words: Seq[String]): String = {
    import graft.functions.TextFunctions.hitPattern
    s"len(regexp_extract_all(substr(clean, 1, 512), '${hitPattern(words)}'))"
  }
  private def posSql = hitCountSql(LexiconSentiment.EngineWords.positive)
  private def negSql = hitCountSql(LexiconSentiment.EngineWords.negative)

  val tweetPipelineSql: String = {
    val clean = cleanSqlFragment
    // E3 location detection input: content.text + ' ' + author_name('').
    val t = "translate(lower(text || ' '), '-/\\|_,;.', '        ')"
    val provWhens = (DictionaryLocator.EngineTopics.cities.map { case (p, c) =>
      s"WHEN regexp_matches($t, '\\b$c\\b') THEN '$p'"
    } ++ DictionaryLocator.EngineTopics.provinces.map { p =>
      s"WHEN regexp_matches($t, '\\b$p\\b') THEN '$p'"
    }).mkString(" ")
    val p = posSql
    val n = negSql
    // n_unprocessed: clean_text / label are never null for the synthesized
    // docs and E3 always stamps detected_from='text_analysis', so the P4
    // predicate reduces to the two nullable checks (always 0 — asserting
    // the reference's backfill invariant inside the oracle).
    s"""WITH cleaned AS (
       |  SELECT doc_id, text, $clean AS clean FROM documents),
       |enriched AS (
       |  SELECT doc_id,
       |    coalesce(CASE $provWhens END, 'unknown') AS province,
       |    CASE WHEN clean IS NULL OR length(clean) = 0 THEN '${LexiconSentiment.FallbackLabel}'
       |         WHEN $p > $n THEN 'positive' WHEN $n > $p THEN 'negative'
       |         ELSE 'neutral' END AS sentiment_label,
       |    coalesce(CAST(abs($p - $n) AS DOUBLE) / nullif(CAST(($p + $n) AS DOUBLE), 0.0), 0.0) AS conf,
       |    CASE WHEN clean IS NULL THEN 1 ELSE 0 END AS unproc
       |  FROM cleaned)
       |SELECT province, sentiment_label, count(*) AS n,
       |  round(avg(conf), 4) AS avg_confidence,
       |  CAST(sum(unproc) AS BIGINT) AS n_unprocessed
       |FROM enriched GROUP BY province, sentiment_label
       |ORDER BY province, sentiment_label""".stripMargin
  }

  /** P1 flat view of the same pipeline output — proves the 12-column
    * projection (flatten_tweet_data, utils.py:204-222) end-to-end.
    */
  def tweetFlat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val job = IngestJob(DictionaryLocator.EngineTopics, LexiconSentiment.EngineWords)
    TweetOps.flatten(job.transform(syntheticRaw(spark, dir), to_timestamp(lit(FixedNow))))
      .select($"_id", $"author_handle", $"created_at", $"tweet_url",
        $"sentiment_label", round($"sentiment_confidence", 4).as("sentiment_confidence"),
        $"sentiment_analyzed")
      .orderBy($"_id")
  }

  val tweetFlatSql: String = {
    val clean = cleanSqlFragment
    val p = posSql
    val n = negSql
    s"""WITH cleaned AS (
       |  SELECT doc_id, $clean AS clean FROM documents)
       |SELECT CAST(doc_id AS VARCHAR) AS _id,
       |  'user' || doc_id AS author_handle,
       |  CAST(date_add(DATE'2025-05-01', CAST(doc_id % 28 AS INT)) AS TIMESTAMP) AS created_at,
       |  'https://x.com/u/status/' || doc_id AS tweet_url,
       |  CASE WHEN clean IS NULL OR length(clean) = 0 THEN '${LexiconSentiment.FallbackLabel}'
       |       WHEN $p > $n THEN 'positive' WHEN $n > $p THEN 'negative'
       |       ELSE 'neutral' END AS sentiment_label,
       |  round(coalesce(CAST(abs($p - $n) AS DOUBLE) / nullif(CAST(($p + $n) AS DOUBLE), 0.0), 0.0), 4) AS sentiment_confidence,
       |  TRUE AS sentiment_analyzed
       |FROM cleaned ORDER BY _id""".stripMargin
  }

  /** The dashboard-feeding roll-up (SURVEY §7.2 flagship slice): daily
    * sentiment distribution per province — event-date x province x label
    * counts with within-day shares, over the full composed pipeline.
    */
  def dailyProvinceSentiment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val job = IngestJob(DictionaryLocator.EngineTopics, LexiconSentiment.EngineWords)
    val processed = job.transform(syntheticRaw(spark, dir), to_timestamp(lit(FixedNow)))
    processed
      .groupBy(
        to_date($"metadata.created_at").as("event_date"),
        coalesce($"location.province", lit("unknown")).as("province"),
        $"sentiment_analysis.label".as("sentiment_label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("day_share", round($"n" / sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_date")), 4))
      .orderBy($"event_date", $"province", $"sentiment_label")
  }

  val dailyProvinceSentimentSql: String = {
    val clean = cleanSqlFragment
    val t = "translate(lower(text || ' '), '-/\\|_,;.', '        ')"
    val provWhens = (DictionaryLocator.EngineTopics.cities.map { case (p, c) =>
      s"WHEN regexp_matches($t, '\\b$c\\b') THEN '$p'"
    } ++ DictionaryLocator.EngineTopics.provinces.map { p =>
      s"WHEN regexp_matches($t, '\\b$p\\b') THEN '$p'"
    }).mkString(" ")
    val p = posSql
    val n = negSql
    s"""WITH cleaned AS (
       |  SELECT doc_id, text, $clean AS clean FROM documents),
       |enriched AS (
       |  SELECT date_add(DATE'2025-05-01', CAST(doc_id % 28 AS INT)) AS event_date,
       |    coalesce(CASE $provWhens END, 'unknown') AS province,
       |    CASE WHEN clean IS NULL OR length(clean) = 0 THEN '${LexiconSentiment.FallbackLabel}'
       |         WHEN $p > $n THEN 'positive' WHEN $n > $p THEN 'negative'
       |         ELSE 'neutral' END AS sentiment_label
       |  FROM cleaned),
       |counts AS (
       |  SELECT event_date, province, sentiment_label, count(*) AS n
       |  FROM enriched GROUP BY 1, 2, 3)
       |SELECT event_date, province, sentiment_label, n,
       |  round(n / sum(n) OVER (PARTITION BY event_date), 4) AS day_share
       |FROM counts
       |ORDER BY event_date, province, sentiment_label""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tweet_pipeline" -> (tweetPipeline _),
    "q_tweet_flat" -> (tweetFlat _),
    "q_daily_province_sentiment" -> (dailyProvinceSentiment _))

  val oracles: Map[String, String] = Map(
    "q_tweet_pipeline" -> tweetPipelineSql,
    "q_tweet_flat" -> tweetFlatSql,
    "q_daily_province_sentiment" -> dailyProvinceSentimentSql)
}
