package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(_ => ("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim")
    val plain = big.join(small, Seq("key")).groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"dim").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedJoin(big, small, "key", n = 8).groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"dim").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    // left join keeps unmatched rows exactly once per big row
    val plainLeft = big.join(small, Seq("key"), "left").count()
    val saltedLeft = ScaleOps.saltedJoin(big, small, "key", 8, "left").count()
    assert(saltedLeft == plainLeft)
  }

  test("salting actually balances the hot key across shuffle partitions") {
    import spark.implicits._
    // 95% of rows share one key: unsalted, every copy lands in ONE
    // reducer partition; salted on (key, salt) they spread over ~n
    val big = ((1 to 9500).map(_ => ("hot", 1)) ++ (1 to 500).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 500).map(i => s"k$i")).zipWithIndex
      .toDF("key", "dim")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevShuf = spark.conf.get("spark.sql.shuffle.partitions")
    // force a real shuffle join and freeze AQE coalescing so partition
    // occupancy is observable; widen the shuffle so the balance ceiling
    // is the SALT count, not the test session's 4 reducer partitions
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      def partSizes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq
      val plainSizes = partSizes(big.join(small, Seq("key")))
      val saltedSizes = partSizes(ScaleOps.saltedJoin(big, small, "key", n = 8))
      assert(plainSizes.sum === saltedSizes.sum) // same row multiset
      // unsalted: the hot partition carries >= all 9500 hot rows;
      // salted: 8 (hot, salt) combos over 32 reducers — even with an
      // unlucky 3-combo hash collision a partition stays under half
      assert(plainSizes.max >= 9500L)
      assert(saltedSizes.max.toDouble <= 9500.0 * 0.5,
        s"salted max partition ${saltedSizes.max} of ${saltedSizes.sum}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevShuf)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i % 97, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i % 89, s"b$i")).toDF("k", "vb")
    // a previous JVM's managed-table directories survive in the warehouse
    // while the in-memory catalog starts empty — clear both sides
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    ScaleOps.writeBucketed(a, "bucketed_a", "k", buckets = 8)
    ScaleOps.writeBucketed(b, "bucketed_b", "k", buckets = 8)
    // disable broadcast so the join must pick SMJ; bucketing then removes
    // both shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      assert(!ScaleOps.hasShuffleExchange(joined))
      assert(joined.count() > 0)
      // sanity: the same join over unbucketed data DOES shuffle
      assert(ScaleOps.hasShuffleExchange(a.join(b, "k")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // Zipf-ish stream: key i appears ~C/i times — real heavy head, long
  // tail, far more distinct keys than MG counters
  private def zipfKeys: Seq[String] =
    (1 to 400).flatMap(i => Seq.fill(2000 / i)(s"key$i"))

  test("heavyHitterSummary: bounded state, no false negatives under adversarial partitioning") {
    import spark.implicits._
    val k = 21
    val n = zipfKeys.length
    val exact = zipfKeys.groupBy(identity).map { case (s, xs) => s -> xs.length.toLong }
    // round-robin repartition spreads every key across all partitions —
    // the layout LEAST favorable to per-partition counters
    val df = zipfKeys.toDF("tok").repartition(13)
    val summary = ScaleOps.heavyHitterSummary(df, col("tok"), k)
    val cand = summary.filter(!$"is_size").select($"key").as[String].collect().toSet
    // every key above share 1/k must be a candidate (the MG guarantee)
    val mustHave = exact.collect { case (s, c) if c > n.toDouble / k => s }.toSet
    assert(mustHave.subsetOf(cand),
      s"missed heavy hitters: ${mustHave -- cand}")
    // bounded state: at most k counters per partition survive
    assert(cand.size <= k * 13)
    // the size rows carry the corpus total
    val total = summary.filter($"is_size").agg(sum($"rows")).head.getLong(0)
    assert(total === n.toLong)
  }

  test("heavyHitters equals the naive group-count exactly; nulls excluded; empty input empty") {
    import spark.implicits._
    val withNulls = zipfKeys.map(Option(_)) ++ Seq.fill(50)(Option.empty[String])
    val df = withNulls.toDF("tok").repartition(7)
    val minShare = 0.02
    val got = ScaleOps.heavyHitters(df, col("tok"), minShare)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val nonNull = zipfKeys.length
    val threshold = math.ceil(minShare * nonNull).toLong
    val expected = zipfKeys.groupBy(identity)
      .collect { case (s, xs) if xs.length >= threshold =>
        (s, xs.length.toLong, xs.length.toDouble / nonNull) }
      .toSet
    assert(got === expected)
    assert(ScaleOps.heavyHitters(Seq.empty[String].toDF("tok"), col("tok"), 0.1)
      .count() === 0L)
  }

  // skewed ranking fixture: group sizes 1..40 (some below k), duplicate
  // order values inside every group (tiebreak must decide), unique ids
  private def rankRows: Seq[(String, Double, Long, String)] =
    (1 to 8).flatMap { g =>
      (1 to g * 5).map { i =>
        (s"g$g", (i % 7).toDouble, (g * 1000 + i).toLong, s"payload$i")
      }
    }

  test("topKPerGroup equals the window formulation on skewed groups, both directions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = rankRows.toDF("grp", "score", "id", "payload").repartition(7)
    for (desc <- Seq(true, false)) {
      val ord = if (desc) $"score".desc else $"score".asc
      val w = Window.partitionBy($"grp").orderBy(ord, $"id".asc)
      val want = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 4)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getString(3), r.getInt(4))).toSet
      val got = ScaleOps.topKPerGroup(df, Seq("grp"), "score", "id", 4, desc)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getString(3), r.getInt(4))).toSet
      assert(got === want, s"descending=$desc")
    }
  }

  test("partialTopKPerGroup ships at most k rows per group per partition") {
    import spark.implicits._
    val df = rankRows.toDF("grp", "score", "id", "payload").repartition(7)
    val survivors = ScaleOps.partialTopKPerGroup(df, Seq("grp"), "score", "id",
      k = 4, descending = true)
    // global bound: <= k * groups * partitions; the big group (200 rows)
    // must be pruned hard
    assert(survivors.count() <= 4L * 8 * 7)
    assert(survivors.filter($"grp" === "g8").count() <= 4L * 7)
  }

  test("topKPerGroup ranks null order values last under desc, first under asc") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = Seq(
      ("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(3.0), 3L), ("a", None, 4L),
      ("b", Option.empty[Double], 5L)).toDF("grp", "score", "id").repartition(3)
    for (desc <- Seq(true, false)) {
      val ord = if (desc) $"score".desc else $"score".asc
      val w = Window.partitionBy($"grp").orderBy(ord, $"id".asc)
      val want = rows.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
        .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), r.getInt(3))).toSet
      val got = ScaleOps.topKPerGroup(rows, Seq("grp"), "score", "id", 2, desc)
        .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2), r.getInt(3))).toSet
      assert(got === want, s"descending=$desc")
    }
  }
}
