package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.model.TweetSchema

/** S2/S4/S7 — JSON landing-zone source and sink (SURVEY.md §2.1).
  *
  * The reference exports MongoDB documents to JSON files and later re-reads
  * them (utils.py:233-241); timestamps round-trip as Mongo extended JSON
  * (`{"$date": "..."}`) while live documents carry plain ISO strings —
  * SURVEY §7.4 risk 6. [[parseFlexibleTimestamp]] handles both in one
  * coalesce, so one reader serves both generations of files.
  */
object TweetJsonSource {

  private val dateWrapper = StructType(Seq(StructField("$date", StringType)))

  /** Parse a timestamp column that may be (a) a plain ISO-8601 string,
    * (b) Mongo extended JSON read into a string (`{"$date":"..."}`), or
    * (c) missing — reference fallback is ingestion time
    * (src/resilient_scraper.py:453-455, F3).
    */
  def parseFlexibleTimestamp(c: Column, fallback: Column = current_timestamp()): Column =
    coalesce(
      to_timestamp(from_json(c, dateWrapper).getField("$date")),
      to_timestamp(c),
      fallback)

  /** Read landed canonical-doc JSON (one object per line; pass
    * `multiLine = true` for the reference's pretty-printed array files).
    * Returns the canonical typed shape regardless of which timestamp
    * encoding the files carry.
    */
  def readLanded(spark: SparkSession, path: String, multiLine: Boolean = false,
      fallback: Column = current_timestamp()): DataFrame = {
    val raw = spark.read
      .schema(TweetSchema.landedJson)
      .option("multiLine", multiLine)
      .json(path)
    raw.withColumn("metadata",
      col("metadata")
        .withField("created_at", parseFlexibleTimestamp(col("metadata.created_at"), fallback))
        .withField("scraped_at", parseFlexibleTimestamp(col("metadata.scraped_at"), fallback)))
  }

  /** Read a raw scrape batch (flat records, string timestamps). */
  def readRawScrape(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(TweetSchema.rawScrape)
      .option("multiLine", multiLine)
      .json(path)

  /** S7: month glob over daily landing files — Spark reads the whole month
    * in one multi-file scan (utils.py:283-297 enumerated + sorted; ordering
    * is irrelevant post-union).
    */
  def monthGlob(dir: String, yearMonth: String): String =
    s"$dir/tweets_$yearMonth-*_labeled.json"

  /** S4: JSON sink (one object per line, UTF-8; the reference's
    * pretty-printed-array framing is presentation, not data —
    * resilient_etl.py:574-584).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
