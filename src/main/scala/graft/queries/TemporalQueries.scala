package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Temporal

/** Temporal queries over the `events` table ([[Temporal]]): as-of join
  * and gap sessionization. Both oracled — DuckDB has native ASOF JOIN,
  * and the sessionization oracle rebuilds session_window's gap rule with
  * lag + a running sum, so the two engines check each other through
  * entirely different algorithms.
  */
object TemporalQueries {

  /** For every click, the latest view by the same user at or before the
    * click ([[Temporal.asOfJoin]], `<=` semantics): the
    * "last-impression-before-conversion" attribution shape. The view side
    * is deduplicated to one row per (user, ts) — max event_id wins — so
    * the as-of pick is deterministic on both engines.
    */
  def asofClickView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "events")
    val clicks = e.filter($"event_type" === "click")
    val views = e.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts")
      .agg(max_by(struct($"event_id", $"value"), $"event_id").as("__v"))
      .select($"user_id", $"ts", $"__v.event_id".as("view_event_id"),
        $"__v.value".as("view_value"))
    Temporal.asOfJoin(
      clicks, $"user_id", $"ts", Seq("event_id", "user_id", "ts"),
      views, $"user_id", $"ts",
      Seq("prev_view_event" -> $"view_event_id",
        "prev_view_ts" -> $"ts",
        "prev_view_value" -> $"view_value"),
      rightOrder = $"view_event_id")
      .select($"event_id", $"user_id",
        $"prev_view_event",
        round($"prev_view_value", 4).as("prev_view_value"),
        (unix_micros($"ts") - unix_micros($"prev_view_ts")).as("staleness_us"))
      .orderBy($"event_id")
  }

  val asofClickViewSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_type
      |  FROM events),
      |views AS (
      |  SELECT user_id, ts, max(event_id) AS view_event_id,
      |    max_by(value, event_id) AS view_value
      |  FROM e WHERE event_type = 'view' GROUP BY user_id, ts),
      |clicks AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id,
      |  v.view_event_id AS prev_view_event,
      |  round(v.view_value, 4) AS prev_view_value,
      |  CASE WHEN v.view_event_id IS NULL THEN NULL
      |    ELSE epoch_us(c.ts) - epoch_us(v.ts) END AS staleness_us
      |FROM clicks c ASOF LEFT JOIN views v
      |  ON c.user_id = v.user_id AND v.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** Per-user gap sessions (30-minute inactivity timeout,
    * [[Temporal.sessionize]] = native session_window): session start,
    * event count, value sum, and active span. The streaming-compatible
    * session shape — the same grouping runs under readStream + watermark.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Temporal.sessionize(
      Tables(spark, dir, "events"), $"user_id", $"ts", "30 minutes")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"),
        (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("span_us"))
      .select($"user_id", unix_micros($"session.start").as("session_start_us"),
        $"n_events", $"sum_value", $"span_us")
      .orderBy($"user_id", $"session_start_us")
  }

  // The gap rule, rebuilt relationally: a session breaks only when the gap
  // to the previous event STRICTLY exceeds 30 min — session_window merges
  // an event landing exactly at last+gap (inclusive bound, measured and
  // pinned by TemporalSpec's boundary test).
  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessioned AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sess
      |  FROM marked)
      |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value,
      |  epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
      |FROM sessioned GROUP BY user_id, sess
      |ORDER BY user_id, session_start_us""".stripMargin

  /** 7-day trailing moving average and sum of daily event volume per
    * event type — a RANGE frame over CALENDAR distance, not row count:
    * a day with no events contributes nothing AND shrinks no window
    * (missing days are simply absent from the frame), which a
    * ROWS-6-PRECEDING frame gets wrong over sparse dailies. Spark lacks
    * interval RANGE frames on date order, so the frame runs over an
    * epoch-day index (`rangeBetween(-6, 0)` on datediff-from-epoch) —
    * identical calendar semantics, and the window stays a single
    * hash-partitioned sort per event_type: at 100 TB the pre-aggregation
    * to (type, day) rows makes the windowed relation tiny regardless of
    * input size.
    */
  def rollingDaily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Temporal.trailingDayWindow($"event_type", $"day", days = 7)
    daily.select($"event_type", $"day", $"n",
        round(avg($"n").over(w), 4).as("avg_7d"),
        sum($"n").over(w).as("sum_7d"))
      .orderBy($"event_type", $"day")
  }

  // DuckDB has the native interval RANGE frame the Spark side emulates
  // with the epoch-day index — same calendar rule via different
  // mechanisms, so the engines cross-check the frame semantics.
  val rollingDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n,
      |  round(avg(n) OVER w, 4) AS avg_7d,
      |  CAST(sum(n) OVER w AS BIGINT) AS sum_7d
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |  RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin

  /** Inter-event gap distribution per user (lag window → aggregate): the
    * cadence profile behind rate limiting, bot detection, and session-
    * timeout tuning. One window sort per user partition, then a bounded
    * per-user aggregate — the windowed relation is the events table
    * itself, but the lag frame carries one row of state, so the sort is
    * the whole cost and it partitions cleanly by user at any scale.
    */
  def eventGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(spark, dir, "events")
      .withColumn("prev", lag($"ts", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"user_id",
        (unix_micros($"ts") - unix_micros($"prev")).as("gap_us"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"),
        min($"gap_us").as("min_gap_us"),
        max($"gap_us").as("max_gap_us"),
        round(avg($"gap_us"), 2).as("avg_gap_us"))
      .orderBy($"user_id")
  }

  // ties on ts break by event_id in BOTH engines so the lag pairs are
  // identical; gap arithmetic in integral micros (no interval rounding)
  val eventGapsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |gaps AS (
      |  SELECT user_id,
      |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
      |  FROM e)
      |SELECT user_id, count(*) AS n_gaps,
      |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
      |  round(avg(gap_us), 2) AS avg_gap_us
      |FROM gaps WHERE gap_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofClickView _),
    "q_sessionize" -> (sessionize _),
    "q_rolling_daily" -> (rollingDaily _),
    "q_event_gaps" -> (eventGaps _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" -> asofClickViewSql,
    "q_sessionize" -> sessionizeSql,
    "q_rolling_daily" -> rollingDailySql,
    "q_event_gaps" -> eventGapsSql)
}
