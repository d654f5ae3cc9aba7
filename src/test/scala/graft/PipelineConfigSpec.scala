package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineConfig

/** [[PipelineConfig]] — the fixture mirrors the reference
  * `config/config.json` key-for-key (five sections, same snake_case
  * knobs), with neutral values.
  */
class PipelineConfigSpec extends AnyFunSuite {

  private val fixture =
    """{
      |  "twitter": {
      |    "cookies_file": "cookies.json",
      |    "base_url": "https://example.invalid",
      |    "query_1": "topic OR alias lang:id",
      |    "max_tweets": 10000,
      |    "days_back": 30,
      |    "use_time_filter": true,
      |    "start_date": "2025-09-01",
      |    "end_date": "2025-09-30",
      |    "daily_processing": true
      |  },
      |  "database": {
      |    "mongo_uri": "mongodb://localhost:27017/",
      |    "db_name": "sentiment_monthly",
      |    "collection_prefix": "monthly_tweets_",
      |    "collection_date_format": "YYYYMMDD"
      |  },
      |  "scraper": {
      |    "scroll_min_pause": 0.01,
      |    "scroll_max_pause": 0.05,
      |    "base_backoff": 5,
      |    "max_retries": 3,
      |    "max_retry_attempts": 10,
      |    "scroll_increment": 500,
      |    "use_headless": true
      |  },
      |  "logging": {
      |    "level": "INFO",
      |    "format": "%(asctime)s - %(levelname)s - %(message)s",
      |    "file": "logs/etl.log"
      |  },
      |  "etl": {
      |    "min_daily_delay": 10,
      |    "max_daily_delay": 30,
      |    "min_monthly_delay": 60,
      |    "max_monthly_delay": 120
      |  }
      |}""".stripMargin

  test("parses the reference config shape into the typed tree") {
    val c = PipelineConfig.parse(fixture)
    assert(c.twitter.maxTweets == 10000 && c.twitter.daysBack == 30)
    assert(c.twitter.useTimeFilter && c.twitter.dailyProcessing)
    assert(c.twitter.startDate == "2025-09-01" && c.twitter.endDate == "2025-09-30")
    assert(c.database.collectionPrefix == "monthly_tweets_")
    assert(c.database.collectionDateFormat == "YYYYMMDD")
    assert(c.scraper.scrollMinPause == 0.01 && c.scraper.maxRetries == 3)
    assert(c.scraper.scrollIncrement == 500 && c.scraper.useHeadless)
    assert(c.logging.level == "INFO" && c.logging.file == "logs/etl.log")
    assert(c.etl.minDailyDelay == 10 && c.etl.maxMonthlyDelay == 120)
  }

  test("load() reads from a file") {
    val f = java.nio.file.Files.createTempFile("cfg", ".json")
    java.nio.file.Files.write(f, fixture.getBytes("UTF-8"))
    try assert(PipelineConfig.load(f.toString).twitter.maxTweets == 10000)
    finally java.nio.file.Files.delete(f)
  }

  test("missing and mistyped knobs fail loudly with the dotted path") {
    val noKey = fixture.replace("\"max_tweets\": 10000,", "")
    val e1 = intercept[IllegalArgumentException](PipelineConfig.parse(noKey))
    assert(e1.getMessage.contains("twitter.max_tweets"))
    val badType = fixture.replace("\"max_tweets\": 10000", "\"max_tweets\": \"many\"")
    val e2 = intercept[IllegalArgumentException](PipelineConfig.parse(badType))
    assert(e2.getMessage.contains("twitter.max_tweets"))
  }
}
