package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalSemDedup

/** Cross-batch semantic dedup store: fixed centroid geometry, transitive
  * suppression through stored vectors, SemDeDup keep policy on fresh
  * clusters, replay idempotence.
  */
class IncrementalSemDedupSpec extends SparkSpec {

  private val Dim = 8

  /** Unit vector at angle `deg` in the (axis, axis+1) plane. */
  private def vec(axis: Int, deg: Double): Array[Float] = {
    val v = Array.fill(Dim)(0f)
    val r = math.toRadians(deg)
    v(axis) = math.cos(r).toFloat
    v(axis + 1) = math.sin(r).toFloat
    v
  }

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "e")
  }

  private def initStore(store: String): Unit =
    // seed: two far-apart modes fix a 2-cell geometry
    IncrementalSemDedup.init(
      df(Seq((100L, vec(0, 0)), (101L, vec(4, 0)))), col("id"), col("e"),
      store, nlist = 2, refineIterations = 0, portableSample = true)

  private def run(store: String, batchId: Long,
      rows: Seq[(Long, Array[Float])], threshold: Double = 0.9) =
    IncrementalSemDedup.semDedupBatch(
        spark, df(rows), col("id"), col("e"), store, batchId, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  test("suppression is transitive across batches through stored vectors") {
    val store = java.nio.file.Files.createTempDirectory("semstore").toString
    initStore(store)
    // A at 0°, B at 20° (cos 0.94 to A), C at 40° (cos 0.94 to B, 0.77 to A)
    assert(run(store, 0, Seq((1L, vec(0, 0)))) == Seq((1L, 1L, true)))
    assert(run(store, 1, Seq((2L, vec(0, 20)))) == Seq((2L, 1L, false)))
    assert(run(store, 2, Seq((3L, vec(0, 40)))) == Seq((3L, 1L, false)),
      "C matches only the suppressed B; it must adopt B's rep (A)")
    // far item in the other mode survives untouched
    assert(run(store, 3, Seq((4L, vec(4, 0)))) == Seq((4L, 4L, true)))
    val surv = IncrementalSemDedup.survivors(spark, store)
      .collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 4L))
  }

  test("fresh clusters keep the farthest-from-centroid member, not min id") {
    val store = java.nio.file.Files.createTempDirectory("semkeep").toString
    initStore(store)
    // one batch, one dup cluster: id 3 sits farthest from the cell
    // centroid (largest angle), so it must be the survivor although its
    // id is the largest — the SemDeDup keep rule
    val got = run(store, 0, Seq(
      (1L, vec(0, 2)), (2L, vec(0, 10)), (3L, vec(0, 24))))
    assert(got.count(_._3) == 1)
    assert(got.find(_._1 == 3L).get._3, s"expected 3 to survive: $got")
    assert(got.forall(_._2 == 3L))
  }

  test("replaying a batch id is idempotent; init is required") {
    val store = java.nio.file.Files.createTempDirectory("semreplay").toString
    val e = intercept[IllegalArgumentException] {
      run(store, 0, Seq((1L, vec(0, 0))))
    }
    assert(e.getMessage.contains("init"))
    initStore(store)
    run(store, 0, Seq((1L, vec(0, 0))))
    val first = run(store, 1, Seq((2L, vec(0, 15))))
    val replay = run(store, 1, Seq((2L, vec(0, 15))))
    assert(first == replay && first == Seq((2L, 1L, false)))
    assert(spark.read.parquet(s"$store/rows").count() == 2)
  }
}
