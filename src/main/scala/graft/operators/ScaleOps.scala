package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-discipline utilities for the 100 TB posture (SURVEY §7.4 risk
  * 7): skew-resistant joins and co-located (bucketed) joins.
  *
  * AQE's skew-join handling covers sort-merge joins it can observe; the
  * explicit salt here is for the cases AQE cannot fix (skewed broadcast-
  * ineligible dimension replicated against a hot key, or deterministic
  * plan requirements). Bucketing removes the shuffle from repeated
  * fact-fact joins on the same key — the lake-side equivalent of
  * co-partitioning.
  */
object ScaleOps {

  /** Skew-resistant equi-join: the big (skewed) side gets a random-ish but
    * data-independent salt in [0, n); the small side is replicated n ways
    * with every salt value; the join keys on (key, salt). Semantically
    * identical to `big.join(small, key)` for any 1:N join where `small` is
    * unique on the key (each big row matches exactly the same small rows it
    * would have matched unsalted).
    *
    * The salt derives from `monotonically_increasing_id` — uniform across
    * partitions and rows, no dependence on the (hot) key values, which is
    * the entire point: one hot key spreads over n reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      n: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched REPLICATED small row n
    // times — only joins that preserve at most the big side are sound
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")
      .contains(normalized),
      s"saltedJoin supports inner/left/semi/anti joins only, got '$joinType'")
    val salted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(n.toLong)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted catalog table on `key` — repeated
    * joins/aggregations on `key` between tables bucketed the same way run
    * shuffle-free (bucket-local sort-merge join).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** True iff the executed plan of `df` contains a shuffle exchange
    * (diagnostic for plan tests — broadcast exchanges don't count).
    */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
  }

  /** Misra–Gries candidate pass for heavy hitters: each partition keeps at
    * most `k` counters (insert if present or space; else decrement ALL and
    * drop zeros — amortized O(1) per row, every decrement retires k+1
    * units of stream mass), then the per-partition summaries aggregate by
    * key. Returns `(key STRING, mg_count, rows)` plus one null-key
    * `is_size` row per partition carrying its row count, so callers get
    * the corpus total without a second scan.
    *
    * GUARANTEE (no false negatives): within partition p, any key with
    * count_p > N_p/k ends with a live counter; a key with GLOBAL count
    * > N/k must exceed N_p/k in at least one partition (else summing the
    * per-partition bounds caps its total at N/k) — so every global heavy
    * hitter above share 1/k appears in the output. False positives are
    * expected and cheap: the summary is at most k·partitions rows
    * (key-independent, bounded state — the entire point at corpus scale,
    * where the naive groupBy shuffles one partial per DISTINCT key per
    * partition: vocabulary-sized state for token streams).
    */
  def heavyHitterSummary(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // null keys are excluded (SQL null-equality would drop them at the
    // rescore join anyway) — coalesce upstream to count them as a value
    df.select(key.cast("string").as("k")).filter(col("k").isNotNull).as[String]
      .mapPartitions { it =>
        // boxed values: a Long-valued map would UNBOX absent-key null to
        // 0L and the presence check could never fire
        val counters = new java.util.HashMap[String, java.lang.Long](k * 2)
        var rows = 0L
        it.foreach { s =>
          rows += 1
          val cur = counters.get(s)
          if (cur ne null) counters.put(s, java.lang.Long.valueOf(cur.longValue + 1))
          else if (counters.size < k) counters.put(s, java.lang.Long.valueOf(1L))
          else {
            val e = counters.entrySet().iterator()
            while (e.hasNext) {
              val kv = e.next()
              if (kv.getValue.longValue == 1L) e.remove()
              else kv.setValue(java.lang.Long.valueOf(kv.getValue.longValue - 1))
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counters.asScala.iterator.map { case (s, c) => (s, c.longValue, 0L, false) } ++
          Iterator.single((null: String, 0L, rows, true))
      }
      .toDF("key", "mg_count", "rows", "is_size")
  }

  /** Exact heavy hitters (keys with count >= ceil(minShare · N)) without
    * ever shuffling per-distinct-key state: a [[heavyHitterSummary]]
    * candidate pass (k = ⌈1/minShare⌉ + 1 ⇒ candidates ⊇ true heavies),
    * then one rescore scan that counts ONLY candidate keys — the
    * broadcast semi-join prunes the map side, and map-side combine bounds
    * the rescore shuffle at candidates × partitions. Two scans total; the
    * same candidates-then-exact-rescore shape as the LSH dedup pipeline,
    * so the approximate pass affects COST, never the answer. Returns
    * `(key, n, share)` exactly equal to the naive
    * `groupBy.count.filter(n >= ceil(minShare·N))` over non-null keys
    * (oracle-gated on the token corpus). The candidate set is collected
    * to the driver — the SAME bytes a broadcast join ships there anyway —
    * so the returned frame's lineage is df + a local relation, freely
    * re-executable with no cached state to pin.
    */
  def heavyHitters(df: DataFrame, key: Column, minShare: Double): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0,
      s"minShare must be in (0, 1], got $minShare")
    val spark = df.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / minShare).toLong.toInt + 1
    // one pass: per-partition MG counters + partition sizes, both read
    // from the one materialized summary (k·partitions rows at most)
    val summary = Checkpoints.materializeFrame(heavyHitterSummary(df, key, k))
    val total = summary.filter(col("is_size"))
      .agg(coalesce(sum(col("rows")), lit(0L))).head.getLong(0)
    val candidates = summary.filter(!col("is_size"))
      .select(col("key")).distinct().as[String].collect()
    Checkpoints.freeFrame(summary)
    val threshold = math.ceil(minShare * total).toLong
    if (total == 0L)
      return spark.emptyDataFrame
        .select(lit("").as("key"), lit(0L).as("n"), lit(0.0).as("share"))
    // rescore pass: count ONLY candidate keys — the broadcast semi-join
    // prunes the scan and map-side combine bounds the shuffle at
    // candidates × partitions, never distinct-keys × partitions
    df.select(key.cast("string").as("key"))
      .join(broadcast(candidates.toSeq.toDF("key")), Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .withColumn("share", col("n") / lit(total))
  }
}
