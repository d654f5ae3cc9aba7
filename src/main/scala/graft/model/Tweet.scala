package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed view of the canonical document (§1.1) for call sites where
  * compile-time safety beats schema dynamism — `Dataset[Tweet]` gives
  * field-checked transforms; the `DataFrame` column API remains the
  * engine's primary surface (the lake schema can evolve without
  * recompiling).
  */
final case class Location(
    province: Option[String],
    city: Option[String],
    detected_from: Option[String],
    original_location: Option[String])

final case class Content(text: Option[String], clean_text: Option[String])

final case class Metadata(
    author_name: Option[String],
    author_handle: Option[String],
    created_at: Option[Timestamp],
    scraped_at: Option[Timestamp],
    location: Option[Location],
    tweet_url: Option[String])

final case class Metrics(
    reply_count: Option[Int],
    retweet_count: Option[Int],
    like_count: Option[Int])

final case class ProcessingStatus(
    sentiment_analyzed: Option[Boolean],
    cleaning_completed: Option[Boolean],
    cleaning_timestamp: Option[String],
    sentiment_analysis_timestamp: Option[String])

final case class SentimentAnalysis(
    label: Option[String],
    confidence_score: Option[Double])

final case class Tweet(
    _id: String,
    content: Option[Content],
    metadata: Option[Metadata],
    metrics: Option[Metrics],
    processing_status: Option[ProcessingStatus],
    sentiment_analysis: Option[SentimentAnalysis],
    location: Option[Location])

object Tweet {
  implicit val encoder: Encoder[Tweet] = Encoders.product[Tweet]

  /** Typed view of a canonical-schema DataFrame (fields matched by name;
    * the partition column, if present, is dropped first).
    */
  def asTweets(df: DataFrame): Dataset[Tweet] = {
    val base =
      if (df.columns.contains("event_date")) df.drop("event_date") else df
    base.as[Tweet](encoder)
  }
}
