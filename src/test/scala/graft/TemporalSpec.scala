package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** [[Temporal]]: as-of join boundary/tie/isolation semantics and
  * session_window gap-boundary parity with the relational oracle rule.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // trades (left) and quotes (right) — the canonical as-of shape
  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 10L),
    (1L, ts("2024-01-01 10:05:00"), 101.0, 11L),
    (1L, ts("2024-01-01 10:10:00"), 102.0, 12L),
    (2L, ts("2024-01-01 10:07:00"), 200.0, 20L)).toDF("k", "qts", "px", "qid")

  private def trades = Seq(
    (1L, ts("2024-01-01 10:04:59"), 1L), // between quotes 10 and 11
    (1L, ts("2024-01-01 10:05:00"), 2L), // exactly at quote 11
    (1L, ts("2024-01-01 09:59:00"), 3L), // before any quote
    (2L, ts("2024-01-01 10:08:00"), 4L), // key-2 only sees key-2 quotes
    (1L, ts("2024-01-01 11:00:00"), 5L)) // long after the last quote
    .toDF("k", "tts", "tid")

  private def run(strict: Boolean) =
    Temporal.asOfJoin(
      trades, $"k", $"tts", Seq("tid"),
      quotes, $"k", $"qts", Seq("px" -> $"px", "qid" -> $"qid"), $"qid",
      strict = strict)
      .orderBy($"tid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap

  test("asOfJoin picks the latest right row at-or-before each left row") {
    val m = run(strict = false)
    assert(m(1L) === Some(10L)) // 10:04:59 → 10:00 quote
    assert(m(2L) === Some(11L)) // <= : the 10:05:00 quote IS visible
    assert(m(3L) === None)      // nothing before 09:59
    assert(m(4L) === Some(20L)) // key isolation: never a key-1 quote
    assert(m(5L) === Some(12L)) // carries arbitrarily far forward
  }

  test("asOfJoin strict mode excludes the right row at exactly leftTs") {
    val m = run(strict = true)
    assert(m(2L) === Some(10L)) // < : the 10:05:00 quote is NOT visible
    assert(m(1L) === Some(10L) && m(3L) === None && m(4L) === Some(20L))
  }

  test("asOfJoin breaks (key, ts) ties on the right by max rightOrder") {
    val dupQuotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 7L),
      (1L, ts("2024-01-01 10:00:00"), 2.0, 9L),
      (1L, ts("2024-01-01 10:00:00"), 3.0, 8L)).toDF("k", "qts", "px", "qid")
    val one = Temporal.asOfJoin(
      trades.filter($"tid" === 1L), $"k", $"tts", Seq("tid"),
      dupQuotes, $"k", $"qts", Seq("qid" -> $"qid"), $"qid")
      .head()
    assert(one.getLong(1) === 9L)
  }

  test("asOfJoin with an empty right side keeps every left row with null payloads") {
    val noQuotes = quotes.filter($"qid" < 0L)
    val out = Temporal.asOfJoin(
      trades, $"k", $"tts", Seq("tid"),
      noQuotes, $"k", $"qts", Seq("px" -> $"px", "qid" -> $"qid"), $"qid")
      .collect()
    assert(out.length === 5 && out.forall(_.isNullAt(2)))
  }

  test("asOfJoin matches SQL ASOF null semantics: null-ts right rows are never predecessors") {
    val nullQuotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0, 10L),
      (Some(1L), None, 999.0, 99L), // null ts: would sort FIRST and leak everywhere
      (None, Some(ts("2024-01-01 09:00:00")), 888.0, 88L)) // null key: matches nothing in SQL
      .toDF("k", "qts", "px", "qid")
    val out = Temporal.asOfJoin(
      trades, $"k", $"tts", Seq("tid"),
      nullQuotes, $"k", $"qts", Seq("qid" -> $"qid"), $"qid")
      .orderBy($"tid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(3L) === None,      // 09:59 trade: the null-ts quote must NOT appear
      "null-ts right row leaked as a predecessor")
    assert(out(1L) === Some(10L)) // real quotes still flow
  }

  test("asOfJoin rejects rightPayload names that collide with leftCols or each other") {
    // without the guard a collision yields duplicate output columns that
    // fail only later with ambiguous-reference errors downstream
    val e1 = intercept[IllegalArgumentException] {
      Temporal.asOfJoin(
        trades, $"k", $"tts", Seq("tid"),
        quotes, $"k", $"qts", Seq("tid" -> $"px"), $"qid")
    }
    assert(e1.getMessage.contains("collide") && e1.getMessage.contains("tid"))
    val e2 = intercept[IllegalArgumentException] {
      Temporal.asOfJoin(
        trades, $"k", $"tts", Seq("tid"),
        quotes, $"k", $"qts", Seq("px" -> $"px", "px" -> $"qid"), $"qid")
    }
    assert(e2.getMessage.contains("duplicate") && e2.getMessage.contains("px"))
  }

  test("asOfJoin and sessionize under heavy key skew: linear row growth, no pair blowup") {
    // one user owns 20 % of a 50k-row corpus on BOTH sides — the regime
    // where a pairwise range-join formulation generates |L_k|·|R_k| ≈ 10⁸
    // candidate rows for that one key. The union-merge window processes
    // exactly |L_k|+|R_k| rows for it, so skew degrades LINEARLY by
    // construction; the invariants that pin that shape:
    //   (1) output cardinality == left cardinality (one row per left row,
    //       whatever the key distribution);
    //   (2) the skewed key's outputs are correct, not just counted — every
    //       trade matches the latest quote at-or-before it.
    val n = 50000
    val skewKey = lit(7L)
    // ids 0,5,10,… → key 7 (20 %); others spread over 997 keys
    val keyed = spark.range(n).select(
      $"id",
      when($"id" % 5 === 0, skewKey).otherwise(pmod($"id", lit(997L)) + 1000L).as("k"))
    val left = keyed.select($"k",
      timestamp_seconds(lit(1700000000L) + $"id" * 2 + 1).as("tts"), $"id".as("tid"))
    val right = keyed.select($"k",
      timestamp_seconds(lit(1700000000L) + $"id" * 2).as("qts"),
      ($"id" * 2).as("px"), $"id".as("qid"))
    val out = Temporal.asOfJoin(
      left, $"k", $"tts", Seq("tid"),
      right, $"k", $"qts", Seq("px" -> $"px"), $"qid")
    assert(out.count() === n.toLong, "as-of output must stay one row per left row under skew")
    // correctness on the skewed key: trade at 2t+1 sees the quote at 2t
    // from the SAME key — its px is 2·qid where qid is the greatest
    // same-key id ≤ tid; for key 7 ids step by 5, so qid == tid exactly
    val bad = out.filter($"px".isNull || $"px" =!= $"tid" * 2).count()
    assert(bad === 0L, s"$bad rows matched a stale or foreign quote")
    // sessionize on the same skewed distribution: sessions PARTITION the
    // events — per-key event totals are conserved exactly
    val sessions = Temporal.sessionize(
      left.select($"k", $"tts".as("ts")), $"k", $"ts", "10 seconds")
      .agg(count(lit(1)).as("n_events"))
    val conserved = sessions.groupBy($"k").agg(sum($"n_events").as("total"))
      .join(left.groupBy($"k").agg(count(lit(1)).as("expected")), Seq("k"))
      .filter($"total" =!= $"expected").count()
    assert(conserved === 0L, "sessionization must conserve per-key event counts under skew")
    // and the skewed key really is 20 % of the corpus (guards the fixture)
    assert(left.filter($"k" === 7L).count() === (n / 5).toLong)
  }

  test("sessionize gap boundary: exactly +gap still merges, beyond it starts a NEW session") {
    // measured session_window semantics (the oracle's lag rule must use
    // STRICT >): the window end is last+gap INCLUSIVE for merging
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // exactly +30:00 → merges
      (1L, ts("2024-01-01 10:59:59")), // +29:59 → merges
      (1L, ts("2024-01-01 11:30:00")), // +30:01 → NEW session
      (2L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val out = Temporal.sessionize(ev, $"user_id", $"ts", "30 minutes")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session.start", $"n")
      .orderBy($"user_id", $"session.start")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 10:00:00.0", 3L),
      (1L, "2024-01-01 11:30:00.0", 1L),
      (2L, "2024-01-01 10:00:00.0", 1L)))
  }

  test("trailingDayWindow frames by CALENDAR distance, not row count") {
    // sparse dailies: a burst (days 1-3), a long gap, a second burst
    // (days 20-21); type "y" guards the partition boundary
    val daily = Seq(
      ("x", "2024-01-01", 10L), ("x", "2024-01-02", 20L),
      ("x", "2024-01-03", 30L), ("x", "2024-01-20", 40L),
      ("x", "2024-01-21", 50L), ("y", "2024-01-02", 7L))
      .toDF("k", "d", "n").select($"k", to_date($"d").as("day"), $"n")
    val w = Temporal.trailingDayWindow($"k", $"day", days = 7)
    val got = daily.select($"k", $"day", sum($"n").over(w).as("s"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .toSeq.sorted
    assert(got === Seq(
      ("x", "2024-01-01", 10L),        // alone
      ("x", "2024-01-02", 30L),        // 01+02
      ("x", "2024-01-03", 60L),        // 01+02+03
      ("x", "2024-01-20", 40L),        // the gap EMPTIES the frame —
      ("x", "2024-01-21", 90L),        //   a ROWS(-6,0) frame would
                                       //   still see days 1-3 here
      ("y", "2024-01-02", 7L)))        // partitions don't leak
  }

  test("sessionize session end is last event + gap") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts")
    val s = Temporal.sessionize(ev, $"user_id", $"ts", "30 minutes")
      .agg(count(lit(1)))
      .select($"session.start", $"session.end").head()
    assert(s.getTimestamp(0).toString === "2024-01-01 10:00:00.0")
    assert(s.getTimestamp(1).toString === "2024-01-01 10:30:00.0")
  }

  test("sessionize runs unchanged under a stream: the watermark finalizes gap sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sessions = Temporal.sessionize(
      mem.toDF().toDF("user_id", "ts").withWatermark("ts", "1 hour"),
      $"user_id", $"ts", "30 minutes")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"session.start".as("start"), $"n")
    val q = sessions.writeStream.format("memory").queryName("gap_sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
    q.processAllAvailable()
    // event far past the session end advances the watermark beyond it...
    mem.addData((1L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // ...and the NEXT batch emits the finalized session in Append mode
    mem.addData((2L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    val got = spark.sql("SELECT user_id, start, n FROM gap_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSeq
    q.stop()
    assert(got.contains((1L, "2024-01-01 10:00:00.0", 2L)),
      s"finalized session missing from $got")
  }
}
