package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators over the testdata star schema.
  *
  * Covers SURVEY.md §2.2 (filters/predicates), §2.5 (dedup / last-write-wins
  * upsert, update-join, anti-join), §2.6 (aggregations), §2.7 (joins) and
  * §2.8 (top-k). Reference semantics cited per query; the physical strategy
  * is Spark-native (hash aggregate, broadcast hash join for dimension
  * tables, window functions for keyed dedup).
  *
  * Determinism contract with the DuckDB oracle: every query carries an
  * explicit ORDER BY over its whole output, double-typed aggregates are
  * computed in exact decimal arithmetic where sums are large (so both
  * engines produce bit-identical doubles) and rounded, and every aggregate
  * column is aliased identically in the Spark plan and the oracle SQL.
  */
object RelationalQueries {

  /** Exact money arithmetic: both Spark and DuckDB sum DECIMAL exactly, so
    * the result is reproducible regardless of partitioning / accumulation
    * order — a float sum would drift between engines at sf>=0.01.
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  private def money(c: Column): Column = round(sum(dec(c)).cast("double"), 2)

  /** TPC-H Q1-style pricing summary (SURVEY §2.6 A2/A3/A5: hash aggregate
    * with conditional inputs; reference per-day tallies at
    * resilient_etl.py:306-311, score stats at notebook cell 15).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        money($"l_quantity").as("sum_qty"),
        money($"l_extendedprice").as("sum_base_price"),
        round(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
          .cast("double"), 2).as("sum_disc_price"),
        round((sum(dec($"l_quantity")).cast("double") / count(lit(1))), 4).as("avg_qty"),
        round((sum(dec($"l_extendedprice")).cast("double") / count(lit(1))), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema join chain: revenue per region (SURVEY §2.7 J1 dimension
    * lookups — broadcast the genuinely bounded dims (nation=25, region=5
    * rows at every scale factor) so the only shuffles are lineitem⋈orders
    * and the final aggregate. `customer` grows with scale factor, so it
    * carries NO broadcast hint: AQE picks broadcast at small SF and a
    * shuffle join at 100 TB, where a forced broadcast would OOM.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        round(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 4)) - dec($"l_discount")))
          .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name")
  }

  val regionRevenueSql: String =
    """SELECT r_name,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Top-k per group via window rank (SURVEY §2.8; planned extension of the
    * reference's `max_tweets` caps, src/resilient_scraper.py:1252).
    */
  def topPartsPerBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables(spark, dir, "part")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"p_brand", $"rk", $"p_partkey", round($"p_retailprice", 2).as("price"))
      .orderBy($"p_brand", $"rk")
  }

  val topPartsPerBrandSql: String =
    """SELECT p_brand, rk, p_partkey, price FROM (
      |  SELECT p_brand,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk,
      |    p_partkey, round(p_retailprice, 2) AS price
      |  FROM part) WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin

  /** [[topPartsPerBrand]] through the bounded-heap path
    * ([[graft.operators.ScaleOps.topKPerGroup]]): a per-partition k-row
    * heap per group prunes the relation BEFORE the group shuffle, then
    * the window ranks only survivors — registered against the SAME
    * oracle SQL as q_top_parts_per_brand, so the prune must change cost
    * only, never the answer.
    */
  def topKBounded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.ScaleOps.topKPerGroup(Tables(spark, dir, "part"),
        Seq("p_brand"), orderCol = "p_retailprice", tieCol = "p_partkey", k = 3)
      .select($"p_brand", $"rk", $"p_partkey", round($"p_retailprice", 2).as("price"))
      .orderBy($"p_brand", $"rk")
  }

  /** Last-write-wins upsert emulation (SURVEY §2.5 D3: the reference's Mongo
    * `UpdateOne({_id},{$set},upsert=True)` at resilient_scraper.py:944-956
    * becomes newest-wins selection over the key). Deterministic tiebreak
    * on event_id so re-runs are idempotent.
    */
  def latestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // max-over-struct, not a row_number window: map-side partial agg ships
    // one candidate per (task, user) instead of sorting every event of
    // every user through the shuffle (struct field order = the window's
    // ts DESC, event_id DESC; both non-null in events)
    Tables(spark, dir, "events")
      .groupBy($"user_id")
      .agg(max(struct($"ts", $"event_id", $"event_type", $"value")).as("__m"))
      .select($"user_id", $"__m.event_id".as("last_event_id"),
        $"__m.event_type".as("last_event_type"),
        round($"__m.value", 4).as("last_value"))
      .orderBy($"user_id")
  }

  val latestEventPerUserSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |  round(value, 4) AS last_value
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id
      |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  /** Date-range predicate + per-day counts (SURVEY §2.2 P3 + §2.6 A2;
    * reference $gte/$lt day windows at resilient_etl.py:306-311). The
    * filter and the date projection both push to the parquet scan.
    */
  def dailyEventCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy(to_date($"ts").as("event_date"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum(dec($"value")).cast("double"), 4).as("sum_value"))
      .orderBy($"event_date", $"event_type")
  }

  val dailyEventCountsSql: String =
    """SELECT CAST(ts AS DATE) AS event_date, event_type,
      |  count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Anti-join resume semantics (SURVEY §2.2 P7 / §2.7 J3: skip
    * already-ingested keys, resilient_etl.py:304-318).
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Update-join: enrich orders with customer attributes, null-tolerant
    * (SURVEY §2.5 D4: the reference writes processed docs back by `_id`
    * left-join, resilient_etl.py:347-358). Left outer join keeps unmatched
    * orders with null customer fields. No broadcast hint on `customer` —
    * it is fact-sized (scales with SF); AQE chooses the join strategy.
    */
  def ordersWithCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    o.join(c, $"o_custkey" === $"c_custkey", "left_outer")
      .select($"o_orderkey",
        coalesce($"c_name", lit("UNKNOWN")).as("customer_name"),
        coalesce($"c_mktsegment", lit("NONE")).as("mktsegment"),
        round($"o_totalprice", 2).as("total_price"))
      .orderBy($"o_orderkey")
  }

  val ordersWithCustomerSql: String =
    """SELECT o_orderkey,
      |  coalesce(c_name, 'UNKNOWN') AS customer_name,
      |  coalesce(c_mktsegment, 'NONE') AS mktsegment,
      |  round(o_totalprice, 2) AS total_price
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Single-pass conditional counts (SURVEY §2.6 A3: needs_cleaning /
    * needs_sentiment tallies, fix_unprocessed_monthly_tweets.py:204-211).
    */
  def conditionalCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .agg(
        count(lit(1)).as("total"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_error"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when($"value" > 50.0, 1L).otherwise(0L)).as("n_high_value"))
  }

  val conditionalCountsSql: String =
    """SELECT count(*) AS total,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value
      |FROM events""".stripMargin

  /** Date-range filter with partition-prunable predicate (SURVEY §2.2 P3). */
  def ordersInRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), money($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  val ordersInRangeSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_price
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Share-of-total (SURVEY §2.6 A8: the README's "~45% positive"
    * distribution claim — count/sum(count)). Computed with a broadcast
    * single-row total joined onto the grouped counts: the `OVER ()` window
    * formulation is equivalent on the bounded distribution but plans an
    * empty-partition WindowExec (single-partition move + warning) —
    * q_daily_province_sentiment keeps the PARTITIONED window variant of
    * A8.
    */
  def eventTypeShares(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dist = Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    dist.crossJoin(broadcast(dist.agg(sum($"n").as("__total"))))
      .withColumn("share", round($"n" / $"__total", 4))
      .drop("__total")
      .orderBy($"event_type")
  }

  val eventTypeSharesSql: String =
    """SELECT event_type, n, round(n / sum(n) OVER (), 4) AS share
      |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin

  /** Set union of heterogeneous slices (SURVEY §2.9 U1: daily→monthly file
    * concat, utils.py:237 — unionByName tolerates schema drift).
    */
  def unionSlices(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "events")
    val a = e.filter($"event_type" === "click").select($"event_id", $"user_id", $"value")
    val b = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value", lit("p").as("tag"))
    a.unionByName(b.drop("tag"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), round(sum(dec($"value")).cast("double"), 4).as("sum_value"))
      .orderBy($"user_id")
  }

  val unionSlicesSql: String =
    """SELECT user_id, count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
      |FROM (
      |  SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase')
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Distinct cardinalities per group (SURVEY §7.1 north-star:
    * approx_count_distinct authors). The oracled query uses EXACT distinct
    * counts — deterministic across engines; the HLL sketch variant (what a
    * 100 TB run would use: mergeable, one pass, bounded memory) is
    * accuracy-tested against this exact result in ScalaTest.
    */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  val distinctUsersSql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact interpolated percentiles per group (A5 extended: distribution
    * shape, not just mean/sum). Spark's `percentile` and DuckDB's
    * `quantile_cont` both use linear interpolation between closest ranks,
    * so the oracle is exact after rounding. The sketch counterpart for a
    * 100 TB single-pass run is `approx_percentile` (KLL-style, mergeable)
    * — not oracle-expressible (engine-specific sketch), and unnecessary
    * here because exact percentiles are one sort-free aggregate per
    * group.
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // widened: exact percentile buffers values per group in the partial
    // aggregate, so a one-row-group file serializes the whole pass
    // ONE percentile aggregate with an array of percentages: three
    // separate percentile(...) calls each buffer EVERY group value in
    // their own partial-aggregate map and sort it independently — 3x the
    // memory and 3x the evaluation sort for identical results
    Tables.wide(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))").as("__q"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        round(element_at($"__q", 1), 4).as("p25"),
        round(element_at($"__q", 2), 4).as("p50"),
        round(element_at($"__q", 3), 4).as("p95"),
        $"n")
      .orderBy($"l_returnflag")
  }

  val priceQuantilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The 100 TB percentile path: `approx_percentile` (Greenwald–Khanna
    * sketch, accuracy 10000 → rank error ≤ 1/10000·n) instead of
    * [[priceQuantiles]]'s exact `percentile`, whose partial aggregate
    * BUFFERS every group value — an exact percentile over a 100 TB fact
    * table is a full per-group sort that cannot stream, while the GK
    * sketch is bounded-memory and merges map-side. Registered rows-only:
    * no external SQL engine reproduces Spark's sketch bit-for-bit; the
    * SketchSpec gate bounds the approx values by the exact per-group
    * value range on the real table instead (beside the HLL accuracy
    * gates — the sketch-accuracy home).
    */
  /** [[distinctUsers]] through HyperLogLog++ (Heule, Nunkesser &
    * Hall, EDBT'13 — Spark's `approx_count_distinct`, rsd 1 %): the
    * constant-state alternative when per-group exact distinct-count
    * state (one entry per distinct user per group in every partial
    * aggregate) outgrows memory — the 100 TB cardinality shape. Sketch
    * state is a few KB per group at any corpus size, map-side
    * combinable, mergeable across partitions.
    *
    * Rows-gated by declared design (the GK-sketch q_price_quantiles_
    * approx convention: no ANSI replay of the HLL register layout);
    * RelationalSpec gates |hll − exact| <= 2 % per group at the
    * registered rsd, and determinism across partitionings (the sketch
    * merge is order-insensitive).
    */
  def distinctUsersApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd = 0.01).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  def priceQuantilesApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D), 10000)")
          .as("__q"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        round(element_at($"__q", 1), 4).as("p25"),
        round(element_at($"__q", 2), 4).as("p50"),
        round(element_at($"__q", 3), 4).as("p95"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** Orders⋈customer through [[graft.operators.ScaleOps.saltedJoin]]
    * (SURVEY §7.4 risk 7: the skew shape AQE cannot fix — a hot key on a
    * broadcast-ineligible build side). Registered against a PLAIN join
    * oracle: the salt must change the shuffle layout only, never the
    * answer — the same cost-not-answer contract as q_topk_bounded. The
    * aggregate keys on mktsegment so the output stays bounded at any
    * scale factor; money sums in exact decimal for cross-engine bit
    * equality.
    */
  def saltedOrdersJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    graft.operators.ScaleOps.saltedJoin(o, c, "o_custkey", n = 8)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        money($"o_totalprice").as("total_price"))
      .orderBy($"c_mktsegment")
  }

  val saltedOrdersJoinSql: String =
    """SELECT c_mktsegment,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** [[priceQuantiles]] through the bounded-state selection path
    * ([[graft.operators.Quantiles.exactGroupQuantiles]]): iterative
    * histogram bracketing instead of `percentile`'s buffer-everything
    * partial aggregate. Registered against the SAME quantile_cont oracle
    * as q_price_quantiles — the bracketing must change cost only, never
    * the answer (the q_topk_bounded / q_decontaminate_bloom contract).
    */
  def priceQuantiles2Pass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // no widen here: the operator PERSISTS (not widens) its 3-column
    // scratch projection under the gate, so the bracketing passes read
    // cached narrow rows instead of re-decoding the source scan — a widen
    // was measured in r17 to explode the histogram exchange (partial-agg
    // rows scale as tasks × keyspace) and was reverted; rationale at
    // graft.operators.Quantiles' scratchPersist call
    graft.operators.Quantiles.exactGroupQuantiles(
        Tables(spark, dir, "lineitem"), "l_returnflag", "l_extendedprice",
        Seq(0.25, 0.5, 0.95))
      .select($"l_returnflag",
        round(element_at($"qs", 1), 4).as("p25"),
        round(element_at($"qs", 2), 4).as("p50"),
        round(element_at($"qs", 3), 4).as("p95"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** Hierarchical rollup (GROUPING SETS): order counts and exact-decimal
    * revenue at (status, priority), per-status subtotal, and grand total
    * in ONE aggregate — the cube/rollup surface of §2.6, computed by
    * Spark's single-shuffle partial-aggregate expansion rather than a
    * UNION of three scans. NULL group placeholders coalesce to 'ALL' so
    * both engines order the levels identically (Spark sorts NULL first,
    * DuckDB last — the sentinel sidesteps the divergence; no real status/
    * priority value collides with it).
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), money($"o_totalprice").as("revenue"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"revenue")
      .orderBy($"status", $"priority")
  }

  val rollupRevenueSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** ANALYZE-style column profile of `orders` in one scan: row count,
    * null count, exact distinct count, and numeric min/max per column —
    * the data-quality report a pipeline emits before trusting a new drop.
    * The wide single-pass aggregate keeps one scan for all columns;
    * exact count(distinct) per column is the oracle-checkable choice at
    * test scale — a 100 TB profile swaps in approx_count_distinct (the
    * HLL sketch accuracy-gated in SketchSpec) without touching the shape.
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")) ++
      (if (numeric(c)) Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c")) else Nil)
    }
    val total = count(lit(1)).as("n_rows")
    val wide = o.agg(total, aggs: _*)
    val stackArgs = cols.map { c =>
      val mn = if (numeric(c)) s"mn_$c" else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric(c)) s"mx_$c" else "CAST(NULL AS DOUBLE)"
      s"'$c', n_rows - nn_$c, nd_$c, $mn, $mx"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_num, max_num)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy(col("col_name"))
  }

  val profileOrdersSql: String = {
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    val rows = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority").map { c =>
      val mn = if (numeric(c)) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (numeric(c)) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num FROM orders""".stripMargin
    }
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** The composite-key form of the bounded-state selection path
    * ([[graft.operators.Quantiles.exactGroupedQuantiles]]): exact p50/p95
    * per (returnflag, linestatus) cell — six groups, one struct-packed
    * bracketing pass, against DuckDB's native two-column quantile_cont.
    */
  def priceQuantiles2d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Quantiles.exactGroupedQuantiles(
        Tables(spark, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), "l_extendedprice",
        Seq(0.5, 0.95))
      .select($"l_returnflag", $"l_linestatus",
        round(element_at($"qs", 1), 4).as("p50"),
        round(element_at($"qs", 2), 4).as("p95"),
        $"n")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val priceQuantiles2dSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Frequency-weighted exact quantiles under the oracle gate
    * ([[graft.operators.Quantiles.exactWeightedQuantiles]]): price
    * percentiles weighted by quantity — each lineitem counts l_quantity
    * times, the "row stands for n units" corpus-stats shape. The DuckDB
    * oracle has no weighted quantile_cont, so it EXPANDS each row
    * `unnest(range(w))`-fold and runs the unweighted one — the exact
    * multiset the weighted definition stands for. The engine never
    * materializes that expansion (weights ride the bounded histogram);
    * the oracle does, which is precisely the cost the operator exists to
    * avoid — and the hash match proves the shortcut changes nothing.
    * l_quantity is integral (1..50) in this data, so the BIGINT casts
    * agree across engines.
    */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Quantiles.exactWeightedQuantiles(
        Tables(spark, dir, "lineitem").withColumn("__w",
          floor($"l_quantity").cast("long")),
        "l_returnflag", "l_extendedprice", Some("__w"), Seq(0.5, 0.95))
      .select($"l_returnflag",
        round(element_at($"qs", 1), 4).as("p50"),
        round(element_at($"qs", 2), 4).as("p95"),
        $"n".as("total_units"))
      .orderBy($"l_returnflag")
  }

  val weightedQuantilesSql: String =
    """WITH expanded AS (
      |  SELECT l_returnflag, l_extendedprice
      |  FROM lineitem, unnest(range(CAST(floor(l_quantity) AS BIGINT))))
      |SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |  count(*) AS total_units
      |FROM expanded GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Semi-structured extraction from the events `props` JSON column —
    * the per-event metadata bag every telemetry pipeline carries
    * (reference: the extended-JSON tweet payloads of utils.py, here at
    * aggregate grain). `from_json` with an explicit schema parses each
    * row ONCE into a typed struct (vs one `get_json_object` walk per
    * extracted field); a malformed row parses to null and lands in the
    * n_events/n_parsed gap rather than failing the scan. Pure projection
    * + map-side-combined hash agg over a handful of event types: one
    * small exchange at any scale.
    */
  def eventProps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .withColumn("k", from_json($"props",
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        count($"k").as("n_parsed"),
        sum($"k").cast("long").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")
  }

  val eventPropsSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  count(CAST(props->>'$.k' AS INTEGER)) AS n_parsed,
      |  CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'$.k' AS INTEGER)) AS min_k,
      |  max(CAST(props->>'$.k' AS INTEGER)) AS max_k,
      |  round(avg(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_props" -> (eventProps _),
    "q_weighted_quantiles" -> (weightedQuantiles _),
    "q_price_quantiles_2d" -> (priceQuantiles2d _),
    "q_rollup_revenue" -> (rollupRevenue _),
    "q_profile_orders" -> (profileOrders _),
    "q_price_quantiles_2pass" -> (priceQuantiles2Pass _),
    "q_salted_join" -> (saltedOrdersJoin _),
    "q_price_quantiles" -> (priceQuantiles _),
    "q_price_quantiles_approx" -> (priceQuantilesApprox _),
    "q_distinct_users" -> (distinctUsers _),
    "q_distinct_users_approx" -> (distinctUsersApprox _),
    "q_pricing_summary" -> (pricingSummary _),
    "q_region_revenue" -> (regionRevenue _),
    "q_top_parts_per_brand" -> (topPartsPerBrand _),
    "q_topk_bounded" -> (topKBounded _),
    "q_latest_event_per_user" -> (latestEventPerUser _),
    "q_daily_event_counts" -> (dailyEventCounts _),
    "q_customers_without_orders" -> (customersWithoutOrders _),
    "q_orders_with_customer" -> (ordersWithCustomer _),
    "q_conditional_counts" -> (conditionalCounts _),
    "q_orders_in_range" -> (ordersInRange _),
    "q_event_type_shares" -> (eventTypeShares _),
    "q_union_slices" -> (unionSlices _))

  val oracles: Map[String, String] = Map(
    "q_event_props" -> eventPropsSql,
    "q_weighted_quantiles" -> weightedQuantilesSql,
    "q_price_quantiles_2d" -> priceQuantiles2dSql,
    "q_rollup_revenue" -> rollupRevenueSql,
    "q_profile_orders" -> profileOrdersSql,
    "q_price_quantiles_2pass" -> priceQuantilesSql, // bracketing path: cost differs, answer must not
    "q_salted_join" -> saltedOrdersJoinSql,
    "q_price_quantiles" -> priceQuantilesSql,
    "q_distinct_users" -> distinctUsersSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_region_revenue" -> regionRevenueSql,
    "q_top_parts_per_brand" -> topPartsPerBrandSql,
    "q_topk_bounded" -> topPartsPerBrandSql, // bounded-heap path: cost differs, answer must not
    "q_latest_event_per_user" -> latestEventPerUserSql,
    "q_daily_event_counts" -> dailyEventCountsSql,
    "q_customers_without_orders" -> customersWithoutOrdersSql,
    "q_orders_with_customer" -> ordersWithCustomerSql,
    "q_conditional_counts" -> conditionalCountsSql,
    "q_orders_in_range" -> ordersInRangeSql,
    "q_event_type_shares" -> eventTypeSharesSql,
    "q_union_slices" -> unionSlicesSql)
}
