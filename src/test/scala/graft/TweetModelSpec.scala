package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{DictionaryLocator, LexiconSentiment}
import graft.model.Tweet
import graft.operators.LakeMerge
import graft.pipeline.IngestJob
import graft.sources.TweetJsonSource

class TweetModelSpec extends SparkSpec {

  test("Dataset[Tweet] round-trips the canonical schema including the lake") {
    val dir = s"target/tmp/typed-${System.nanoTime()}"
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/raw.json"), Seq(
      """{"_id":"1","text":"Makan gratis di Bandung bagus","author_name":"A","author_handle":"a","created_at":"2025-05-01T08:00:00Z","location":null,"tweet_url":"https://x.com/a/status/1","metrics":{"reply_count":1,"retweet_count":2,"like_count":3}}""")
      .mkString("\n").getBytes("UTF-8"))
    val job = IngestJob(DictionaryLocator.Indonesian, LexiconSentiment.Indonesian)
    val fixedNow = to_timestamp(lit("2025-06-01 10:00:00"))
    job.run(spark, s"$dir/raw.json", s"$dir/lake", fixedNow)

    // typed view straight off the lake (partition column dropped)
    val tweets = Tweet.asTweets(LakeMerge.readLake(spark, s"$dir/lake")).collect()
    assert(tweets.length == 1)
    val t = tweets.head
    assert(t._id == "1")
    assert(t.content.flatMap(_.clean_text).exists(_.contains("bandung")))
    assert(t.location.flatMap(_.province).contains("Jawa Barat"))
    assert(t.sentiment_analysis.flatMap(_.label).contains("positive"))
    assert(t.processing_status.flatMap(_.sentiment_analyzed).contains(true))
    assert(t.metrics.flatMap(_.like_count).contains(3))

    // and typed -> untyped round trip keeps the doc intact
    import spark.implicits._
    val back = spark.createDataset(tweets.toSeq)(Tweet.encoder)
    assert(back.count() == 1)
    assert(back.select($"metadata.author_handle").head.getString(0) == "a")
  }
}
