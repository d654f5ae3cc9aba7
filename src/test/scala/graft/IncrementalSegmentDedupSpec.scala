package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Curation, IncrementalSegmentDedup}
import graft.streaming.StreamingIngest

/** Cross-batch segment-level exact dedup against the persistent segment
  * store — [[IncrementalSegmentDedup]]. Exact equality is transitive, so
  * the load-bearing claim is EQUALITY with one-shot
  * [[Curation.segmentDedup]] over the concatenated corpus, plus replay
  * idempotency of the store partitions.
  */
class IncrementalSegmentDedupSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = s"target/tmp/$name-${System.nanoTime()}"
    Files.createDirectories(Paths.get(d))
    d
  }

  // 2-token segments; "b1 b2" is the shared boilerplate segment
  private val batch1 = Seq(
    (1L, "b1 b2 u1 u2"),   // keeps both (first occurrence of boilerplate)
    (2L, "b1 b2 u3 u4"))   // loses "b1 b2" within batch 1
  private val batch2 = Seq(
    (3L, "b1 b2 u5 u6"),   // loses "b1 b2" to the STORE (batch 1)
    (4L, "u5 u6 u7 u8"))   // loses "u5 u6" to doc 3 within batch 2
  private val batch3 = Seq(
    (5L, "b1 b2 u3 u4"))   // loses everything: both segs already kept

  private def outRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4),
        r.getString(5))).toSeq

  test("incremental over 3 batches equals one-shot segmentDedup over the concatenation") {
    val store = tmpDir("segstore")
    val incremental = Seq(batch1, batch2, batch3).zipWithIndex.flatMap {
      case (b, i) =>
        outRows(IncrementalSegmentDedup.segmentDedupBatch(
          spark, b.toDF("doc_id", "text"), col("doc_id"), col("text"),
          store, batchId = i.toLong, segTokens = 2))
    }
    val oneShot = outRows(Curation.segmentDedup(
      (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"),
      col("doc_id"), col("text"), segTokens = 2))
    assert(incremental === oneShot)
    // and the semantics themselves: doc 5 lost everything transitively
    assert(incremental.find(_._1 == 5L).get === ((5L, 2L, 0L, false, "")))
    assert(incremental.find(_._1 == 3L).get === ((3L, 2L, 1L, true, "u5 u6")))
    // and the DEEP-HISTORY plan (probe-broadcast batch×store, forced by
    // storeProbeBytesMin = 0) produces the identical rows — both join
    // plans of the size gate are equality-pinned, not just the default
    val store2 = tmpDir("segstore-probed")
    val probed = Seq(batch1, batch2, batch3).zipWithIndex.flatMap {
      case (b, i) =>
        outRows(IncrementalSegmentDedup.segmentDedupBatch(
          spark, b.toDF("doc_id", "text"), col("doc_id"), col("text"),
          store2, batchId = i.toLong, segTokens = 2,
          storeProbeBytesMin = 0L))
    }
    assert(probed === oneShot)
  }

  test("a replayed batch recomputes against the pre-batch state and changes nothing") {
    val store = tmpDir("segstore-replay")
    IncrementalSegmentDedup.segmentDedupBatch(spark,
      batch1.toDF("doc_id", "text"), col("doc_id"), col("text"), store, 0L,
      segTokens = 2)
    val first = outRows(IncrementalSegmentDedup.segmentDedupBatch(spark,
      batch2.toDF("doc_id", "text"), col("doc_id"), col("text"), store, 1L,
      segTokens = 2))
    val storedAfterFirst = IncrementalSegmentDedup.storedSegments(spark, store)
      .orderBy($"seg_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // replay batch 1 (crash-recovery case): same output, same store
    val replay = outRows(IncrementalSegmentDedup.segmentDedupBatch(spark,
      batch2.toDF("doc_id", "text"), col("doc_id"), col("text"), store, 1L,
      segTokens = 2))
    val storedAfterReplay = IncrementalSegmentDedup.storedSegments(spark, store)
      .orderBy($"seg_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(replay === first)
    assert(storedAfterReplay === storedAfterFirst)
  }

  test("store holds each distinct kept segment exactly once, with its text") {
    val store = tmpDir("segstore-content")
    IncrementalSegmentDedup.segmentDedupBatch(spark,
      batch1.toDF("doc_id", "text"), col("doc_id"), col("text"), store, 0L,
      segTokens = 2)
    IncrementalSegmentDedup.segmentDedupBatch(spark,
      batch2.toDF("doc_id", "text"), col("doc_id"), col("text"), store, 1L,
      segTokens = 2)
    val segs = IncrementalSegmentDedup.storedSegments(spark, store)
      .collect().map(_.getString(1)).toSeq
    assert(segs.sorted === Seq("b1 b2", "u1 u2", "u3 u4", "u5 u6", "u7 u8"))
    assert(segs.distinct.size === segs.size)
  }

  test("in-stream store compaction folds committed partitions without changing suppression") {
    val landing = tmpDir("segc-landing")
    val store = tmpDir("segc-store")
    val output = tmpDir("segc-output")
    val ckpt = tmpDir("segc-ckpt")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val json = rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
        .mkString("\n")
      Files.writeString(Paths.get(s"$landing/$name.json"), json)
    }
    writeFile("f1", batch1)
    writeFile("f2", batch2)
    writeFile("f3", batch3)
    val q = StreamingIngest.startSegmentDedup(spark, landing, store, output,
      ckpt, segTokens = 2, maxFilesPerTrigger = 1, compactEvery = 2)
    q.awaitTermination()
    // 3 batches, compaction at batch 2 folded 0..1 -> partitions now
    // {batch=1 (consolidated), batch=2}
    val parts = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(parts === Seq("batch=1", "batch=2"))
    // row content preserved: distinct kept segments unchanged
    val segs = IncrementalSegmentDedup.storedSegments(spark, store)
      .collect().map(_.getString(1)).toSeq
    assert(segs.sorted === Seq("b1 b2", "u1 u2", "u3 u4", "u5 u6", "u7 u8"))
    // and suppression against the COMPACTED history still works: a new
    // batch whose segments all live in consolidated partitions drops them
    val after = IncrementalSegmentDedup.segmentDedupBatch(spark,
      Seq((9L, "b1 b2 u7 u8")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), store, 3L, segTokens = 2)
    assert(outRows(after) === Seq((9L, 2L, 0L, false, "")))
  }

  test("ANY ordered batch split of a random corpus equals one-shot (property over splits)") {
    // deterministic pseudo-random corpus with heavy segment sharing:
    // 40 docs, 6 tokens each from an 8-token vocab => many cross-doc
    // duplicate 2-token segments
    def tok(seed: Int): String = s"t${((seed * 2654435761L) % 8 + 8) % 8}"
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 6).map(j => tok(i * 31 + j)).mkString(" ")))
    val oneShot = outRows(Curation.segmentDedup(
      docs.toDF("doc_id", "text"), col("doc_id"), col("text"), segTokens = 2))
    // three different split shapes: uneven, singleton-heavy, two-way
    val splits: Seq[Seq[Int]] = Seq(
      Seq(5, 15, 20), Seq(1, 1, 1, 37), Seq(25, 15))
    splits.foreach { shape =>
      val store = tmpDir(s"segstore-prop-${shape.mkString("_")}")
      var offset = 0
      val incremental = shape.zipWithIndex.flatMap { case (sz, b) =>
        val slice = docs.slice(offset, offset + sz)
        offset += sz
        outRows(IncrementalSegmentDedup.segmentDedupBatch(
          spark, slice.toDF("doc_id", "text"), col("doc_id"), col("text"),
          store, b.toLong, segTokens = 2))
      }
      assert(incremental.sortBy(_._1) === oneShot,
        s"split $shape diverged from one-shot")
    }
  }

  test("streaming wrapper: cumulative file-stream output equals one-shot, resume-safe") {
    val landing = tmpDir("seg-landing")
    val store = tmpDir("seg-store-stream")
    val output = tmpDir("seg-output")
    val ckpt = tmpDir("seg-ckpt")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val json = rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
        .mkString("\n")
      Files.writeString(Paths.get(s"$landing/$name.json"), json)
    }
    writeFile("f1", batch1)
    val q1 = StreamingIngest.startSegmentDedup(spark, landing, store, output,
      ckpt, segTokens = 2, maxFilesPerTrigger = 1)
    q1.awaitTermination()
    // new arrivals + restart from the same checkpoint
    writeFile("f2", batch2)
    writeFile("f3", batch3)
    val q2 = StreamingIngest.startSegmentDedup(spark, landing, store, output,
      ckpt, segTokens = 2, maxFilesPerTrigger = 1)
    q2.awaitTermination()
    val streamed = spark.read.parquet(output)
      .select($"id", $"n_seg", $"n_kept", $"keep_frac", $"kept", $"kept_text")
    val oneShot = Curation.segmentDedup(
      (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"),
      col("doc_id"), col("text"), segTokens = 2)
    assert(outRows(streamed) === outRows(oneShot))
  }
}
