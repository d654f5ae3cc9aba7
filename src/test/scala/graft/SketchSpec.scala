package graft

import org.apache.spark.sql.functions._

/** Distinct-count sketches: the 100 TB path replaces exact distinct counts
  * (a full shuffle of the key domain) with HLL++ (mergeable fixed-size
  * state). This spec bounds the sketch's error against the exact answer on
  * real testdata — the same pairing the oracled q_distinct_users query
  * relies on.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct tracks exact distinct counts within rsd bounds") {
    import spark.implicits._
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val both = e.groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (tpe, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.06, s"$tpe: approx $approx vs exact $exact (err $err)")
    }
  }

  test("sketches merge across partitionings to the same estimate") {
    import spark.implicits._
    val e = Tables(spark, "/root/testdata/sf0.001", "events")
    val whole = e.agg(approx_count_distinct($"user_id", 0.02)).as[Long].head()
    val repart = e.repartition(13, $"event_id")
      .agg(approx_count_distinct($"user_id", 0.02)).as[Long].head()
    assert(whole == repart) // HLL registers merge associatively
  }

  test("registered q_distinct_users_approx tracks q_distinct_users within 2%") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.queries.RelationalQueries.distinctUsers(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.queries.RelationalQueries.distinctUsersApprox(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (tpe, n) =>
      val err = math.abs(approx(tpe) - n).toDouble / n
      assert(err <= 0.02,
        s"$tpe: q_distinct_users_approx ${approx(tpe)} vs exact $n (err $err > 2%)")
    }
  }

  test("approx percentile query tracks the exact one within the GK rank-error bound") {
    val dir = "/root/testdata/sf0.01"
    val exact = graft.queries.RelationalQueries.priceQuantiles(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.queries.RelationalQueries.priceQuantilesApprox(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    // accuracy 10000 → rank error <= n/10000; at sf0.01 group sizes
    // (~20k rows) that is a handful of ranks — assert each approx
    // quantile within 1% of the exact VALUE, far looser than the rank
    // bound implies on this near-uniform price distribution, but tight
    // enough that a broken sketch (or a wrong percentage array) fails
    for ((flag, (e25, e50, e95)) <- exact) {
      val (a25, a50, a95) = approx(flag)
      for (((e, a), name) <- Seq((e25, a25) -> "p25", (e50, a50) -> "p50", (e95, a95) -> "p95"))
        assert(math.abs(a - e) / e < 0.01, s"$flag $name: approx $a vs exact $e")
    }
  }
}
