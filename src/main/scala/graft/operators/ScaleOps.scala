package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
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
      .agg(coalesce(sum(col("rows")), lit(0L))).head().getLong(0)
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

  /** Rank comparator over external Row values for [[topKPerGroup]]:
    * negative iff row `a` ranks STRICTLY BEFORE row `b` under the final
    * window order (order column desc-or-asc with Spark's null placement —
    * desc ⇒ nulls last, asc ⇒ nulls first — then tie column asc, nulls
    * first). Numeric columns only: integral types compare as long,
    * floating as IEEE double, decimals as BigDecimal — each the same
    * total order Catalyst's SortOrder uses for that type, which is what
    * makes per-partition pruning under this comparator a sound superset
    * of the window's top k.
    */
  private def rankComparator(
      schema: org.apache.spark.sql.types.StructType,
      orderIdx: Int, tieIdx: Int, descending: Boolean): java.util.Comparator[Row] = {
    import org.apache.spark.sql.types._
    def cmpFor(dt: DataType, name: String): (Any, Any) => Int = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        (a, b) => java.lang.Long.compare(
          a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        (a, b) => java.lang.Double.compare(
          a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue)
      case _: DecimalType =>
        (a, b) => a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
      case other => throw new IllegalArgumentException(
        s"topKPerGroup order/tie columns must be numeric; '$name' is $other")
    }
    val cmpO = cmpFor(schema(orderIdx).dataType, schema(orderIdx).name)
    val cmpT = cmpFor(schema(tieIdx).dataType, schema(tieIdx).name)
    // task closures capture this comparator — it must survive serialization
    new java.util.Comparator[Row] with Serializable {
      override def compare(a: Row, b: Row): Int = {
        val ao = a.get(orderIdx); val bo = b.get(orderIdx)
        val c =
          if ((ao == null) && (bo == null)) 0
          else if (ao == null) { if (descending) 1 else -1 } // desc: null last
          else if (bo == null) { if (descending) -1 else 1 }
          else { val v = cmpO(ao, bo); if (descending) -v else v }
        if (c != 0) c
        else {
          val at = a.get(tieIdx); val bt = b.get(tieIdx)
          if ((at == null) && (bt == null)) 0
          else if (at == null) -1 // tie is asc ⇒ nulls first
          else if (bt == null) 1
          else cmpT(at, bt)
        }
      }
    }
  }

  /** Per-partition candidate pass for [[topKPerGroup]]: each partition
    * keeps a bounded worst-out heap of at most `k` rows PER GROUP it
    * sees, so at most k · (groups in partition) rows survive to the
    * shuffle — the same state class as a hash-aggregate partial (one
    * bounded buffer per local group), where the window formulation ships
    * and sorts EVERY row of the relation through the group exchange.
    * Soundness: the global top k of a group under a total order is a
    * subset of the union of per-partition top k's under the SAME order
    * (any row displaced from a partition heap has k rows of its own
    * partition ranked before it, so it cannot be in the global top k).
    */
  private[graft] def partialTopKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tieCol: String, k: Int, descending: Boolean): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "at least one group column required")
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val rankCmp = rankComparator(
      schema, schema.fieldIndex(orderCol), schema.fieldIndex(tieCol), descending)
    val worstFirst = rankCmp.reversed() // heap head = currently worst-ranked
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    df.mapPartitions { it =>
      val heaps = new java.util.HashMap[Seq[Any], java.util.PriorityQueue[Row]]()
      it.foreach { r =>
        val key: Seq[Any] = gIdx.map(i => r.get(i)).toSeq
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[Row](k + 1, worstFirst)
          heaps.put(key, pq)
        }
        pq.add(r)
        if (pq.size > k) pq.poll()
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  /** Exact top-k rows per group WITHOUT sorting the whole relation
    * through the group shuffle: a [[partialTopKPerGroup]] bounded-heap
    * pass prunes each partition to ≤ k rows per local group, then the
    * authoritative `row_number` window ranks only the ≤ k · partitions
    * survivors per group — the candidates-then-exact-rescore shape again
    * (cf. [[heavyHitters]]), the approximate pass affecting cost, never
    * the answer. Output = the input rows ranked 1..k per group plus an
    * `rk` column, equal to the plain window formulation whenever
    * `(orderCol, tieCol)` is unique within a group (the same condition
    * the window query itself needs to be deterministic).
    *
    * Ordering contract: `orderCol` descending (default) or ascending
    * with Spark's null placement, ties broken by `tieCol` ascending;
    * both must be numeric.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCol: String, k: Int, descending: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pruned = partialTopKPerGroup(df, groupCols, orderCol, tieCol, k, descending)
    val ord = if (descending) col(orderCol).desc else col(orderCol).asc
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord, col(tieCol).asc)
    pruned.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
