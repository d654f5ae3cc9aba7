package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{DictionaryLocator, LexiconSentiment, TextFunctions}
import graft.model.TweetSchema

/** The reference pipeline's projections and enrichment stages as pure
  * DataFrame transforms (SURVEY.md §2.2 P1/P2/P4, §2.4 E3/E4).
  *
  * Every stage is a single projection over the nested document — struct
  * updates via `withField`, no UDFs — so the whole
  * nest→clean→locate→label chain collapses into one codegen'd map stage
  * with no shuffle anywhere before the lake write.
  *
  * Determinism: stages take the processing time as a `now` column
  * (defaulting to `current_timestamp()`) so tests and idempotency checks
  * can pin it — the reference stamps wall-clock `datetime.now()`
  * (utils.py:149,196), which is the one nondeterminism its re-runs have.
  */
object TweetOps {

  private def nullString: Column = lit(null).cast("string")

  /** Normalize a free-form location string to the canonical struct
    * (shape 1 of SURVEY §1.3; src/resilient_scraper.py:631-638).
    */
  def locationFromString(s: Column): Column =
    // the reference gate is `location_str.strip()` — Python strip, which
    // drops tab/newline/NBSP-only strings that Spark's ASCII-space trim
    // would pass through as a non-empty location
    when(s.isNotNull && TextFunctions.pyStrip(s) =!= "",
      struct(
        nullString.as("province"),
        nullString.as("city"),
        nullString.as("detected_from"),
        s.as("original_location")))

  /** P5: the scraper's minimum-length gate — drop records whose trimmed
    * text is under `minChars` (ads/empty fragments,
    * src/resilient_scraper.py:399,533). Applied to RAW records before the
    * nest projection, where the reference applies it.
    */
  def minLengthFilter(raw: DataFrame, minChars: Int = 5): DataFrame =
    // `len(text.strip()) < 5` in the reference: Python strip — a doc like
    // "abc \t\n" measures 3, not the 7 Spark's ASCII-space trim reports
    raw.filter(length(TextFunctions.pyStrip(coalesce(col("text"), lit("")))) >= minChars)

  /** P2: raw scrape record -> canonical nested doc
    * (process_and_save_tweets, src/resilient_scraper.py:909-936): F2-clean
    * + lowercase into content.clean_text, ISO parse with now() fallback
    * (F3), scraped_at stamp, sentiment_analyzed=false.
    */
  def nest(raw: DataFrame, now: Column = current_timestamp()): DataFrame =
    raw.select(
      coalesce(col("_id"), lit("")).as("_id"),
      struct(
        col("text"),
        lower(TextFunctions.cleanTextScraper(col("text"))).as("clean_text")).as("content"),
      struct(
        coalesce(col("author_name"), lit("")).as("author_name"),
        coalesce(col("author_handle"), lit("")).as("author_handle"),
        coalesce(to_timestamp(col("created_at")), now).as("created_at"),
        now.as("scraped_at"),
        locationFromString(col("location")).as("location"),
        coalesce(col("tweet_url"), lit("")).as("tweet_url")).as("metadata"),
      col("metrics"),
      struct(
        lit(false).as("sentiment_analyzed"),
        lit(null).cast("boolean").as("cleaning_completed"),
        nullString.as("cleaning_timestamp"),
        nullString.as("sentiment_analysis_timestamp")).as("processing_status"),
      lit(null).cast(TweetSchema.sentimentAnalysis).as("sentiment_analysis"),
      lit(null).cast(TweetSchema.location).as("location"))

  /** E3: `apply_data_cleaning` (utils.py:95-154) —
    *  - content.clean_text = F1 over the RAW text (empty-string default for
    *    null text, mirroring .get('text',''));
    *  - if the ROOT location is missing, run dictionary detection over
    *    text + author_name and stamp the struct (detected_from is hardcoded
    *    'text_analysis' by the reference, utils.py:132) into BOTH
    *    metadata.location and the root — overwriting any prior
    *    metadata.location, as the reference does;
    *  - processing_status.cleaning_completed = true + ISO timestamp.
    */
  def applyDataCleaning(
      df: DataFrame,
      dict: DictionaryLocator.LocationDict,
      now: Column = current_timestamp()): DataFrame = {
    val det = DictionaryLocator.detect(
      concat_ws(" ", col("content.text"), col("metadata.author_name")), dict)
    val detected = struct(
      det.getField("province").as("province"),
      det.getField("city").as("city"),
      lit("text_analysis").as("detected_from"),
      nullString.as("original_location"))
    val needsLocation = col("location").isNull
    df
      .withColumn("content", col("content").withField("clean_text",
        TextFunctions.cleanTweetText(coalesce(col("content.text"), lit("")))))
      .withColumn("__loc", when(needsLocation, detected))
      .withColumn("metadata", when(needsLocation,
        col("metadata").withField("location", col("__loc"))).otherwise(col("metadata")))
      .withColumn("location", coalesce(col("__loc"), col("location")))
      .drop("__loc")
      .withColumn("processing_status", col("processing_status")
        .withField("cleaning_completed", lit(true))
        .withField("cleaning_timestamp", date_format(now, "yyyy-MM-dd'T'HH:mm:ss")))
  }

  /** E4: `apply_sentiment_labeling` (utils.py:157-201) with the
    * deterministic lexicon classifier: truncate clean_text to 512 chars
    * (F6, utils.py:84-86), score, stamp sentiment_analysis struct +
    * processing flags. The production model path goes through
    * [[graft.operators.SentimentRunner]] with the same output contract.
    */
  def applySentimentLabeling(
      df: DataFrame,
      lexicon: LexiconSentiment.Lexicon,
      now: Column = current_timestamp()): DataFrame =
    df
      .withColumn("sentiment_analysis",
        LexiconSentiment.score(
          substring(coalesce(col("content.clean_text"), lit("")), 1, 512), lexicon))
      .withColumn("processing_status", col("processing_status")
        .withField("sentiment_analyzed", lit(true))
        .withField("sentiment_analysis_timestamp",
          date_format(now, "yyyy-MM-dd'T'HH:mm:ss")))

  /** P4: the backfill predicate (`detect_unprocessed_tweets`,
    * fix_unprocessed_monthly_tweets.py:96-111). Mongo `$exists:false`
    * translates per SURVEY §1.3 normalization: a location "without the
    * province field" is one where detection never ran, i.e.
    * `detected_from` is null (after E3 it is always 'text_analysis', which
    * is exactly how the reference's invariant re-query reaches zero —
    * `$exists` is satisfied by present-but-null values).
    */
  def unprocessed(df: DataFrame): DataFrame =
    df.filter(
      col("content.clean_text").isNull ||
        col("sentiment_analysis.label").isNull ||
        col("location").isNull || col("location.detected_from").isNull)

  /** E5: `update_tweet_locations` (utils.py:495-546) — batch location
    * repair with the shape-3 wrapper. Differences from E3:
    *  - detection input is content.text alone (the reference computes an
    *    `all_text` with author fields but never uses it, and the canonical
    *    doc has no root author_name, so `.get('author_name','')` is always
    *    '' and the author append never fires);
    *  - detected_from is 'text' when anything was found, else 'none'
    *    (utils.py:520);
    *  - when a location already exists the reference wraps it as
    *    {original, detected}; under the normalized single-struct schema
    *    (SURVEY §1.3) that becomes the detected fields plus
    *    original_location = the prior location's best string form
    *    (its original_location, else city, else province).
    */
  def updateTweetLocations(
      df: DataFrame,
      dict: DictionaryLocator.LocationDict): DataFrame = {
    val det = DictionaryLocator.detect(col("content.text"), dict)
    val detInfo = struct(
      det.getField("province").as("province"),
      det.getField("city").as("city"),
      when(det.getField("province").isNotNull || det.getField("city").isNotNull, "text")
        .otherwise("none").as("detected_from"),
      nullString.as("original_location"))
    val orig = coalesce(col("location"), col("metadata.location"))
    val wrapped = detInfo.withField("original_location",
      coalesce(orig.getField("original_location"),
        orig.getField("city"), orig.getField("province")))
    df
      .withColumn("metadata", col("metadata").withField("location",
        when(orig.isNull, detInfo).otherwise(wrapped)))
      .withColumn("location", coalesce(col("location"), detInfo))
  }

  /** P1: the 12-column flat analysis view (`flatten_tweet_data`,
    * utils.py:204-222; notebook cell 5).
    */
  def flatten(df: DataFrame): DataFrame =
    df.select(
      col("_id"),
      coalesce(col("content.text"), lit("")).as("text"),
      coalesce(col("content.clean_text"), lit("")).as("clean_text"),
      coalesce(col("metadata.author_handle"), lit("")).as("author_handle"),
      col("metadata.created_at").as("created_at"),
      coalesce(col("metadata.tweet_url"), lit("")).as("tweet_url"),
      coalesce(col("metrics.reply_count"), lit(0)).as("reply_count"),
      coalesce(col("metrics.retweet_count"), lit(0)).as("retweet_count"),
      coalesce(col("metrics.like_count"), lit(0)).as("like_count"),
      coalesce(col("sentiment_analysis.label"), lit("")).as("sentiment_label"),
      coalesce(col("sentiment_analysis.confidence_score"), lit(0.0)).as("sentiment_confidence"),
      coalesce(col("processing_status.sentiment_analyzed"), lit(false)).as("sentiment_analyzed"))
}
