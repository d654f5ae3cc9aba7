package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Typed loader for the reference's `config/config.json` shape
  * (reference `resilient_etl.py:28-39` loads it as an untyped dict at
  * module init; every knob is then read by dotted path). The Scala
  * surface is a case-class tree so a missing or mistyped knob fails at
  * LOAD time with the offending JSON path, not deep inside a job — and
  * the pipeline entry points ([[IngestJob]], [[MonthlyRollup]],
  * [[ModeDispatch]]) keep taking plain typed parameters, with this
  * loader as the file-to-parameters bridge.
  *
  * Field-for-field mirror of the reference file's five sections
  * (`twitter`, `database`, `scraper`, `logging`, `etl`); snake_case JSON
  * keys map to camelCase fields. Scrape-side knobs (cookies, scroll
  * pacing) are carried verbatim even though scraping itself is external
  * to this library (BASELINE.json convention) — a user's existing config
  * file must load unmodified.
  */
final case class TwitterConfig(
    cookiesFile: String, baseUrl: String, query1: String, maxTweets: Int,
    daysBack: Int, useTimeFilter: Boolean, startDate: String,
    endDate: String, dailyProcessing: Boolean)

final case class DatabaseConfig(
    mongoUri: String, dbName: String, collectionPrefix: String,
    collectionDateFormat: String)

final case class ScraperConfig(
    scrollMinPause: Double, scrollMaxPause: Double, baseBackoff: Int,
    maxRetries: Int, maxRetryAttempts: Int, scrollIncrement: Int,
    useHeadless: Boolean)

final case class LoggingConfig(level: String, format: String, file: String)

final case class EtlConfig(
    minDailyDelay: Int, maxDailyDelay: Int, minMonthlyDelay: Int,
    maxMonthlyDelay: Int)

final case class PipelineConfig(
    twitter: TwitterConfig, database: DatabaseConfig, scraper: ScraperConfig,
    logging: LoggingConfig, etl: EtlConfig)

object PipelineConfig {

  /** Load and type-check a config file; IllegalArgumentException with the
    * dotted path on any missing/mistyped knob.
    */
  def load(path: String): PipelineConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def parse(json: String): PipelineConfig = {
    val root = new ObjectMapper().readTree(json)
    def at(node: JsonNode, path: String, key: String): JsonNode = {
      val n = node.get(key)
      require(n != null && !n.isNull, s"config: missing key $path.$key")
      n
    }
    def str(n: JsonNode, p: String, k: String): String = {
      val v = at(n, p, k)
      require(v.isTextual, s"config: $p.$k must be a string")
      v.asText()
    }
    def int(n: JsonNode, p: String, k: String): Int = {
      val v = at(n, p, k)
      require(v.canConvertToInt && v.isIntegralNumber, s"config: $p.$k must be an int")
      v.asInt()
    }
    def dbl(n: JsonNode, p: String, k: String): Double = {
      val v = at(n, p, k)
      require(v.isNumber, s"config: $p.$k must be a number")
      v.asDouble()
    }
    def bool(n: JsonNode, p: String, k: String): Boolean = {
      val v = at(n, p, k)
      require(v.isBoolean, s"config: $p.$k must be a boolean")
      v.asBoolean()
    }
    val tw = at(root, "", "twitter")
    val db = at(root, "", "database")
    val sc = at(root, "", "scraper")
    val lg = at(root, "", "logging")
    val et = at(root, "", "etl")
    PipelineConfig(
      TwitterConfig(
        cookiesFile = str(tw, "twitter", "cookies_file"),
        baseUrl = str(tw, "twitter", "base_url"),
        query1 = str(tw, "twitter", "query_1"),
        maxTweets = int(tw, "twitter", "max_tweets"),
        daysBack = int(tw, "twitter", "days_back"),
        useTimeFilter = bool(tw, "twitter", "use_time_filter"),
        startDate = str(tw, "twitter", "start_date"),
        endDate = str(tw, "twitter", "end_date"),
        dailyProcessing = bool(tw, "twitter", "daily_processing")),
      DatabaseConfig(
        mongoUri = str(db, "database", "mongo_uri"),
        dbName = str(db, "database", "db_name"),
        collectionPrefix = str(db, "database", "collection_prefix"),
        collectionDateFormat = str(db, "database", "collection_date_format")),
      ScraperConfig(
        scrollMinPause = dbl(sc, "scraper", "scroll_min_pause"),
        scrollMaxPause = dbl(sc, "scraper", "scroll_max_pause"),
        baseBackoff = int(sc, "scraper", "base_backoff"),
        maxRetries = int(sc, "scraper", "max_retries"),
        maxRetryAttempts = int(sc, "scraper", "max_retry_attempts"),
        scrollIncrement = int(sc, "scraper", "scroll_increment"),
        useHeadless = bool(sc, "scraper", "use_headless")),
      LoggingConfig(
        level = str(lg, "logging", "level"),
        format = str(lg, "logging", "format"),
        file = str(lg, "logging", "file")),
      EtlConfig(
        minDailyDelay = int(et, "etl", "min_daily_delay"),
        maxDailyDelay = int(et, "etl", "max_daily_delay"),
        minMonthlyDelay = int(et, "etl", "min_monthly_delay"),
        maxMonthlyDelay = int(et, "etl", "max_monthly_delay")))
  }
}
