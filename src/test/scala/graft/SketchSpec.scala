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
}
