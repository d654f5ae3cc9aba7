package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{DictionaryLocator, LexiconSentiment}
import graft.operators.{LakeMerge, TweetOps}
import graft.pipeline.{BackfillJob, IngestJob}
import graft.sources.TweetJsonSource

class TweetPipelineSpec extends SparkSpec {

  private val fixedNow = to_timestamp(lit("2025-06-01 10:00:00"))
  private val job = IngestJob(DictionaryLocator.Indonesian, LexiconSentiment.Indonesian)

  private def tmpDir(name: String): String = {
    val d = s"target/tmp/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  private def writeRaw(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes("UTF-8"))

  private def raw200(id: String, text: String, createdAt: String): String =
    s"""{"_id":"$id","text":"$text","author_name":"N","author_handle":"n","created_at":"$createdAt","location":null,"tweet_url":"https://x.com/n/status/$id","metrics":{"reply_count":0,"retweet_count":0,"like_count":0}}"""

  private val batch1 = Seq(
    """{"_id":"1","text":"Makan bergizi gratis di Bandung bagus dan sehat","author_name":"Andi","author_handle":"andi","created_at":"2025-05-01T08:00:00Z","location":null,"tweet_url":"https://x.com/andi/status/1","metrics":{"reply_count":1,"retweet_count":2,"like_count":3}}""",
    """{"_id":"2","text":"program MBG gagal total banyak keracunan http://t.co/x #MBG","author_name":"Budi","author_handle":"budi","created_at":"2025-05-01T09:30:00Z","location":"Surabaya","tweet_url":"https://x.com/budi/status/2","metrics":{"reply_count":0,"retweet_count":0,"like_count":1}}""",
    """{"_id":"3","text":"menu @dinas hari ini biasa saja","author_name":"Cici","author_handle":"cici","created_at":"2025-05-02T11:00:00Z","location":null,"tweet_url":"https://x.com/cici/status/3","metrics":{"reply_count":5,"retweet_count":1,"like_count":9}}""")

  // same _id=2 with a later scraped_at re-scrape (text edited) + one new doc
  private val batch2 = Seq(
    """{"_id":"2","text":"program MBG di Surabaya lancar dan bagus","author_name":"Budi","author_handle":"budi","created_at":"2025-05-01T09:30:00Z","location":"Surabaya","tweet_url":"https://x.com/budi/status/2","metrics":{"reply_count":0,"retweet_count":4,"like_count":2}}""",
    """{"_id":"4","text":"antri makan gratis di jogja","author_name":"Dewi","author_handle":"dewi","created_at":"2025-05-02T12:00:00Z","location":null,"tweet_url":"https://x.com/dewi/status/4","metrics":{"reply_count":2,"retweet_count":0,"like_count":0}}""")

  test("nest -> clean -> label produces the canonical doc with stamps") {
    val dir = tmpDir("ingest-basic")
    writeRaw(s"$dir/raw.json", batch1)
    val out = job.transform(TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow)
      .orderBy("_id").collect()
    assert(out.length == 3)
    val r1 = out(0)
    val content = r1.getStruct(r1.fieldIndex("content"))
    assert(content.getString(1).contains("bandung")) // clean_text lowercased
    val loc = r1.getStruct(r1.fieldIndex("location"))
    assert(loc.getString(0) == "Jawa Barat" && loc.getString(1) == "Bandung")
    assert(loc.getString(2) == "text_analysis")
    val sent = r1.getStruct(r1.fieldIndex("sentiment_analysis"))
    assert(sent.getString(0) == "positive")
    val status = r1.getStruct(r1.fieldIndex("processing_status"))
    assert(status.getBoolean(0) && status.getBoolean(1)) // analyzed + cleaned
    assert(status.getString(2) == "2025-06-01T10:00:00")
    // doc 2 had a UI location string -> reference still re-detects because
    // the ROOT location is absent on fresh docs; negative lexicon hits win
    val r2 = out(1)
    val s2 = r2.getStruct(r2.fieldIndex("sentiment_analysis"))
    assert(s2.getString(0) == "negative")
  }

  test("ingest is idempotent: running the same batch twice yields an identical lake") {
    val dir = tmpDir("ingest-idem")
    writeRaw(s"$dir/raw.json", batch1)
    val lake = s"$dir/lake"
    job.run(spark, s"$dir/raw.json", lake, fixedNow)
    val first = LakeMerge.readLake(spark, lake).orderBy("_id").toJSON.collect().toSeq
    job.run(spark, s"$dir/raw.json", lake, fixedNow)
    val second = LakeMerge.readLake(spark, lake).orderBy("_id").toJSON.collect().toSeq
    assert(first == second)
  }

  test("merge is last-write-wins by _id with incoming priority") {
    val dir = tmpDir("ingest-lww")
    writeRaw(s"$dir/raw1.json", batch1)
    writeRaw(s"$dir/raw2.json", batch2)
    val lake = s"$dir/lake"
    job.run(spark, s"$dir/raw1.json", lake, fixedNow)
    job.run(spark, s"$dir/raw2.json", lake, to_timestamp(lit("2025-06-02 10:00:00")))
    val docs = LakeMerge.readLake(spark, lake)
    assert(docs.count() == 4)
    val d2 = docs.filter(col("_id") === "2").select(col("content.text")).head.getString(0)
    assert(d2.contains("lancar")) // batch2 version won
    // partition layout: event_date folders by created_at day
    assert(docs.select(col(LakeMerge.PartitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet == Set("2025-05-01", "2025-05-02"))
  }

  test("backfill invariant: unprocessed count reaches zero") {
    val dir = tmpDir("backfill")
    writeRaw(s"$dir/raw.json", batch1)
    val lake = s"$dir/lake"
    // land RAW nested docs (no E3/E4) — all three are P4-unprocessed
    val nested = TweetOps.nest(
      TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow)
    LakeMerge.mergeWrite(spark, nested, lake)
    assert(TweetOps.unprocessed(LakeMerge.readLake(spark, lake)).count() == 3)
    val remaining = BackfillJob(DictionaryLocator.Indonesian, LexiconSentiment.Indonesian)
      .run(spark, lake, fixedNow)
    assert(remaining == 0L)
    // repaired docs carry full stamps
    val lakeDf = LakeMerge.readLake(spark, lake)
    assert(lakeDf.filter(col("processing_status.cleaning_completed")).count() == 3)
  }

  test("E5 update_tweet_locations: fresh detection vs shape-3 wrapper") {
    val dir = tmpDir("e5")
    writeRaw(s"$dir/raw.json", batch1)
    val nested = TweetOps.nest(
      TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow)
    val updated = TweetOps.updateTweetLocations(nested, DictionaryLocator.Indonesian)
      .orderBy("_id").collect()
    // doc 1: no prior location anywhere -> metadata.location = fresh detection
    val m1 = updated(0).getStruct(updated(0).fieldIndex("metadata"))
    val l1 = m1.getStruct(4)
    assert(l1.getString(0) == "Jawa Barat" && l1.getString(1) == "Bandung")
    assert(l1.getString(2) == "text" && l1.getString(3) == null)
    // doc 2: prior UI-string location ("Surabaya") -> shape-3 wrapper keeps
    // it in original_location; its text mentions no place, so the detected
    // fields stay null with detected_from 'none'
    val m2 = updated(1).getStruct(updated(1).fieldIndex("metadata"))
    val l2 = m2.getStruct(4)
    assert(l2.getString(3) == "Surabaya")    // original preserved
    assert(l2.getString(0) == null && l2.getString(2) == "none")
    // doc 3: nothing detectable -> detected_from = 'none'
    val m3 = updated(2).getStruct(updated(2).fieldIndex("metadata"))
    val l3 = m3.getStruct(4)
    assert(l3.getString(0) == null && l3.getString(2) == "none")
    // root location gets the detection struct on all three (was null)
    updated.foreach { r => assert(!r.isNullAt(r.fieldIndex("location"))) }
  }

  test("landed-JSON reader coalesces $date extended JSON and plain ISO timestamps") {
    val dir = tmpDir("landed")
    val lines = Seq(
      """{"_id":"a","content":{"text":"t","clean_text":"t"},"metadata":{"author_name":"","author_handle":"","created_at":{"$date":"2025-05-01T08:00:00Z"},"scraped_at":"2025-05-03T00:00:00Z","location":null,"tweet_url":""},"metrics":{"reply_count":0,"retweet_count":0,"like_count":0},"processing_status":{"sentiment_analyzed":false,"cleaning_completed":null,"cleaning_timestamp":null,"sentiment_analysis_timestamp":null},"sentiment_analysis":null,"location":null}""",
      """{"_id":"b","content":{"text":"t2","clean_text":"t2"},"metadata":{"author_name":"","author_handle":"","created_at":"2025-05-02T09:00:00Z","scraped_at":{"$date":"2025-05-03T01:00:00Z"},"location":null,"tweet_url":""},"metrics":{"reply_count":0,"retweet_count":0,"like_count":0},"processing_status":{"sentiment_analyzed":false,"cleaning_completed":null,"cleaning_timestamp":null,"sentiment_analysis_timestamp":null},"sentiment_analysis":null,"location":null}""",
      // canonical extended JSON ({"$numberLong": epoch-millis}) — without
      // its parse branch this fell through to the ingestion-time fallback,
      // silently rewriting event time
      """{"_id":"c","content":{"text":"t3","clean_text":"t3"},"metadata":{"author_name":"","author_handle":"","created_at":{"$date":{"$numberLong":"1746086400000"}},"scraped_at":{"$date":{"$numberLong":"1746235800500"}},"location":null,"tweet_url":""},"metrics":{"reply_count":0,"retweet_count":0,"like_count":0},"processing_status":{"sentiment_analyzed":false,"cleaning_completed":null,"cleaning_timestamp":null,"sentiment_analysis_timestamp":null},"sentiment_analysis":null,"location":null}""")
    Files.write(Paths.get(s"$dir/landed.json"), String.join("\n", lines: _*).getBytes("UTF-8"))
    val got = TweetJsonSource.readLanded(spark, s"$dir/landed.json")
      .select(col("_id"),
        col("metadata.created_at").cast("string"),
        col("metadata.scraped_at").cast("string"))
      .orderBy("_id").collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got(0) == ("a", "2025-05-01 08:00:00", "2025-05-03 00:00:00"))
    assert(got(1) == ("b", "2025-05-02 09:00:00", "2025-05-03 01:00:00"))
    // 1746086400000 = 2025-05-01T08:00:00Z; sub-second millis preserved
    assert(got(2) == ("c", "2025-05-01 08:00:00", "2025-05-03 01:30:00.5"))
  }

  test("monthly rollup writes once and skips when already rolled up") {
    import graft.pipeline.MonthlyRollup
    val dir = tmpDir("rollup")
    writeRaw(s"$dir/raw.json", batch1)
    val lake = s"$dir/lake"
    job.run(spark, s"$dir/raw.json", lake, fixedNow)
    val out = s"$dir/monthly/2025-05"
    assert(MonthlyRollup.runIfNeeded(spark, lake, "2025-05", out))
    assert(spark.read.parquet(out).count() == 3) // whole month concatenated
    // second invocation is a no-op (resume semantics)
    assert(!MonthlyRollup.runIfNeeded(spark, lake, "2025-05", out))
    // a different (empty) month still writes, with zero rows
    assert(MonthlyRollup.runIfNeeded(spark, lake, "2025-07", s"$dir/monthly/2025-07"))
    assert(spark.read.parquet(s"$dir/monthly/2025-07").count() == 0)
  }

  test("running totals via observe and the max-docs cap") {
    val dir = tmpDir("stats")
    writeRaw(s"$dir/raw.json", batch1)
    val (_, stats) = job.runWithStats(spark, s"$dir/raw.json", s"$dir/lake", fixedNow)
    assert(stats("total_docs") == 3L)
    assert(stats("n_days") == 2L)     // 2025-05-01 and 2025-05-02
    assert(stats("n_located") == 1L)  // only doc 1 mentions a place in TEXT
    val capped = IngestJob(DictionaryLocator.Indonesian, LexiconSentiment.Indonesian,
      maxDocs = Some(2))
    val (_, s2) = capped.runWithStats(spark, s"$dir/raw.json", s"$dir/lake2", fixedNow)
    assert(s2("total_docs") == 2L)
  }

  test("P5 min-length gate drops ad/empty fragments before the nest") {
    val dir = tmpDir("minlen")
    writeRaw(s"$dir/raw.json", batch1 ++ Seq(
      raw200("97", "ad", "2025-05-01T01:00:00Z"),
      raw200("98", "    ", "2025-05-01T01:00:00Z"),
      raw200("99", "okay!", "2025-05-01T01:00:00Z"))) // exactly 5 chars kept
    val out = job.transform(
      TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow)
      .select(col("_id")).collect().map(_.getString(0)).toSet
    assert(out == Set("1", "2", "3", "99"))
  }

  test("S4/S2 round trip: JSON sink output re-reads into the canonical shape") {
    val dir = tmpDir("roundtrip")
    writeRaw(s"$dir/raw.json", batch1)
    val processed = job.transform(
      TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow)
    TweetJsonSource.writeJson(processed, s"$dir/export")
    val back = TweetJsonSource.readLanded(spark, s"$dir/export/*.json", fallback = fixedNow)
    assert(back.count() == 3)
    val a = processed.orderBy("_id").toJSON.collect().toSeq
    val b = back.orderBy("_id").toJSON.collect().toSeq
    assert(a == b)
  }

  test("S4 array framing: one strict JSON-array file, parser-verified round trip") {
    val dir = tmpDir("arrayframe")
    writeRaw(s"$dir/raw.json", batch1)
    val processed = job.transform(
      TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow).orderBy("_id")
    TweetJsonSource.writeJsonArray(processed, s"$dir/export")
    val files = new java.io.File(s"$dir/export").listFiles
      .filter(_.getName.startsWith("part-"))
    assert(files.length == 1) // ONE file, like the reference's json.dump
    val text = new String(java.nio.file.Files.readAllBytes(files.head.toPath), "UTF-8")
    assert(text.startsWith("[\n  {") && text.trim.endsWith("]"))
    // a real strict JSON array parser accepts the whole file and sees every
    // document (trailing garbage or JSONL framing would fail here)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    mapper.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    val tree = mapper.readTree(text)
    assert(tree.isArray && tree.size == 3)
    assert(tree.get(0).get("_id").isTextual)
    // the Spark multiLine reader recovers the canonical shape exactly
    val back = TweetJsonSource.readLanded(
      spark, files.head.getPath, multiLine = true, fallback = fixedNow)
    assert(back.orderBy("_id").toJSON.collect().toSeq == processed.toJSON.collect().toSeq)
    // framing is byte-deterministic for ordered input
    TweetJsonSource.writeJsonArray(processed, s"$dir/export2")
    val text2 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/export2").listFiles
        .filter(_.getName.startsWith("part-")).head.toPath), "UTF-8")
    assert(text2 == text)
    // empty input -> a legal empty array, same as json.dump([])
    TweetJsonSource.writeJsonArray(processed.limit(0), s"$dir/empty")
    val etext = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/empty").listFiles
        .filter(_.getName.startsWith("part-")).head.toPath), "UTF-8").trim
    assert(etext == "[]")
    // a ZERO-partition plan (not just zero rows) must still produce the
    // "[]" part file — coalesce(1) cannot raise 0 partitions to 1 and
    // would emit only _SUCCESS, breaking any re-reader of the export
    val zeroPart = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], processed.schema)
    assert(zeroPart.rdd.getNumPartitions == 0)
    TweetJsonSource.writeJsonArray(zeroPart, s"$dir/empty0")
    val ztext = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/empty0").listFiles
        .filter(_.getName.startsWith("part-")).head.toPath), "UTF-8").trim
    assert(ztext == "[]")
  }

  test("ReprocessJob recomputes derived columns idempotently for a date range") {
    import graft.pipeline.ReprocessJob
    val dir = tmpDir("reprocess")
    writeRaw(s"$dir/raw.json", batch1)
    val lake = s"$dir/lake"
    job.run(spark, s"$dir/raw.json", lake, fixedNow)
    val later = to_timestamp(lit("2025-06-05 09:00:00"))
    ReprocessJob(DictionaryLocator.Indonesian, LexiconSentiment.Indonesian)
      .run(spark, lake, "2025-05-01", "2025-05-02", later)
    val lakeDf = LakeMerge.readLake(spark, lake)
    assert(lakeDf.count() == 3) // no rows gained or lost
    // derived stamps advanced to the reprocess time; labels unchanged
    val stamps = lakeDf.select(col("processing_status.cleaning_timestamp"))
      .collect().map(_.getString(0)).toSet
    assert(stamps == Set("2025-06-05T09:00:00"))
    assert(TweetOps.unprocessed(lakeDf).count() == 0)
    val labels = lakeDf.orderBy("_id")
      .select(col("sentiment_analysis.label")).collect().map(_.getString(0)).toSeq
    assert(labels == Seq("positive", "negative", "neutral"))
  }

  test("lake reads prune to the filtered event_date partitions") {
    val dir = tmpDir("prune")
    writeRaw(s"$dir/raw.json", batch1) // lands 2025-05-01 and 2025-05-02
    val lake = s"$dir/lake"
    job.run(spark, s"$dir/raw.json", lake, fixedNow)
    val pruned = LakeMerge.readLake(spark, lake)
      .filter(col(LakeMerge.PartitionCol) === "2025-05-01")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filters must reach the scan; only the matching partition
    // directory is read (the "collection per day" routing as pruning)
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"),
      s"no partition filter in:\n$scan")
    assert(pruned.count() == 2)
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.forall(_.contains("event_date=2025-05-01")))
  }

  test("flatten produces the 12-column analysis view") {
    val dir = tmpDir("flatten")
    writeRaw(s"$dir/raw.json", batch1)
    val flat = TweetOps.flatten(
      job.transform(TweetJsonSource.readRawScrape(spark, s"$dir/raw.json"), fixedNow))
    assert(flat.columns.toSeq == Seq("_id", "text", "clean_text", "author_handle",
      "created_at", "tweet_url", "reply_count", "retweet_count", "like_count",
      "sentiment_label", "sentiment_confidence", "sentiment_analyzed"))
    assert(flat.count() == 3)
    assert(flat.filter(col("sentiment_analyzed")).count() == 3)
  }
}
