package graft

import org.apache.spark.sql.functions._

import graft.config.ScaleGates
import graft.operators.Dedup

/** [[ScaleGates]] — the consolidated measured-size plan gates: defaults
  * match the r15 per-file constants, conf overrides are honored, and an
  * override actually flips the gated plan (pinned on the CC
  * short-circuit, whose two paths are output-identical by contract).
  */
class ScaleGatesSpec extends SparkSpec {

  test("defaults match the r15 measured constants") {
    assert(ScaleGates.lshBroadcastBandRowsMax(spark) == 4000000L)
    assert(ScaleGates.lshBroadcastSigRowsMax(spark) == 1000000L)
    assert(ScaleGates.lshNarrowSelfJoinBandRowsMin(spark) == 8000000L)
    assert(ScaleGates.semBroadcastVecRowsMax(spark) == 1000000L)
    assert(ScaleGates.imageBroadcastBandRowsMax(spark) == 4000000L)
    assert(ScaleGates.segmentStoreProbeBytesMin(spark) == (2L << 30))
    assert(ScaleGates.localCcEdgesMax(spark) == 250000L)
  }

  test("a session conf override is honored and unset restores the default") {
    spark.conf.set(ScaleGates.LocalCcEdgesMaxKey, "7")
    try assert(ScaleGates.localCcEdgesMax(spark) == 7L)
    finally spark.conf.unset(ScaleGates.LocalCcEdgesMaxKey)
    assert(ScaleGates.localCcEdgesMax(spark) ==
      ScaleGates.LocalCcEdgesMaxDefault)
    spark.conf.set(ScaleGates.SegmentStoreProbeBytesMinKey, "123")
    try assert(ScaleGates.segmentStoreProbeBytesMin(spark) == 123L)
    finally spark.conf.unset(ScaleGates.SegmentStoreProbeBytesMinKey)
  }

  test("localCcEdgesMax override flips connectedComponents to the " +
      "distributed fixpoint with identical labeling") {
    import spark.implicits._
    // two components: a chain 1-2-3-4 and a pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L))
      .toDF("a", "b")
    val viaLocal = Dedup.connectedComponents(pairs, col("a"), col("b"))
      .as[(Long, Long)].collect().toSet
    spark.conf.set(ScaleGates.LocalCcEdgesMaxKey, "0")
    val viaFixpoint =
      try Dedup.connectedComponents(pairs, col("a"), col("b"))
        .as[(Long, Long)].collect().toSet
      finally spark.conf.unset(ScaleGates.LocalCcEdgesMaxKey)
    assert(viaLocal == viaFixpoint)
    assert(viaLocal == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }
}
