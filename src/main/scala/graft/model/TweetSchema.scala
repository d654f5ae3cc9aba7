package graft.model

import org.apache.spark.sql.types._

/** Canonical tweet document schema (SURVEY.md §1.1; shape constructed at
  * reference src/resilient_scraper.py:916-934 and extended by the transform
  * layer, utils.py:95-201).
  *
  * The reference's `location` polymorphism (§1.3: UI string | detection
  * struct | {original, detected} wrapper) is normalized to ONE struct:
  *  - shape 1 (plain UI string)   -> (null, null, null, original_location=s)
  *  - shape 2 (detection struct)  -> fields carried as-is
  *  - shape 3 (wrapper)           -> detected fields + original_location
  *
  * Mongo `$exists` semantics translate as: "field exists (possibly null)"
  * -> `detected_from` non-null marks that detection ran, which is what the
  * backfill predicate (P4) keys on.
  */
object TweetSchema {

  val location: StructType = StructType(Seq(
    StructField("province", StringType),
    StructField("city", StringType),
    StructField("detected_from", StringType),
    StructField("original_location", StringType)))

  val content: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("clean_text", StringType)))

  val metadata: StructType = StructType(Seq(
    StructField("author_name", StringType),
    StructField("author_handle", StringType),
    StructField("created_at", TimestampType),
    StructField("scraped_at", TimestampType),
    StructField("location", location),
    StructField("tweet_url", StringType)))

  val metrics: StructType = StructType(Seq(
    StructField("reply_count", IntegerType),
    StructField("retweet_count", IntegerType),
    StructField("like_count", IntegerType)))

  // Processing timestamps are ISO-8601 STRINGS in the reference
  // (datetime.now().isoformat(), utils.py:149,196) — kept as strings.
  val processingStatus: StructType = StructType(Seq(
    StructField("sentiment_analyzed", BooleanType),
    StructField("cleaning_completed", BooleanType),
    StructField("cleaning_timestamp", StringType),
    StructField("sentiment_analysis_timestamp", StringType)))

  val sentimentAnalysis: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("confidence_score", DoubleType)))

  /** The full canonical document. `location` is duplicated at the root by
    * the cleaning stage (utils.py:143), mirrored here.
    */
  val canonical: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("content", content),
    StructField("metadata", metadata),
    StructField("metrics", metrics),
    StructField("processing_status", processingStatus),
    StructField("sentiment_analysis", sentimentAnalysis),
    StructField("location", location)))

  /** Raw scrape-batch record (the scraper's per-tweet dict before the nest
    * projection, src/resilient_scraper.py:376-502): flat, string timestamp,
    * free-form location string.
    */
  val rawScrape: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("text", StringType),
    StructField("author_name", StringType),
    StructField("author_handle", StringType),
    StructField("created_at", StringType),
    StructField("location", StringType),
    StructField("tweet_url", StringType),
    StructField("metrics", metrics)))

  /** Canonical doc as it appears in exported/landed JSON: timestamps are
    * STRINGS — either plain ISO or Mongo extended JSON rendered as an
    * object. Spark reads both into StringType (an object arrives as its
    * JSON text), and [[graft.sources.TweetJsonSource]] coalesce-parses.
    */
  val landedJson: StructType = {
    val md = StructType(metadata.fields.map {
      case f if f.name == "created_at" || f.name == "scraped_at" =>
        f.copy(dataType = StringType)
      case f => f
    })
    StructType(canonical.fields.map {
      case f if f.name == "metadata" => f.copy(dataType = md)
      case f => f
    })
  }
}
