package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, IncrementalSegmentDedup}

/** One-off measurement main for the PERSISTENT segment store
  * ([[IncrementalSegmentDedup]]) vs the naive alternative — re-running
  * one-shot [[Curation.segmentDedup]] over the accumulated corpus every
  * time a crawl batch lands.
  *
  * Corpus: n synthetic 40-token docs (4 segments of 10 at the operator
  * default). Each doc opens with one of 20 shared BOILERPLATE segments
  * (the crawl-header / license-block shape segment dedup exists for) and
  * follows with 3 own segments keyed on the doc id — so ~25 % of corpus
  * volume is cross-doc duplicate mass with hot election keys, and the
  * rest is unique. Exact equality being transitive, the incremental
  * per-doc outputs must equal the final one-shot run's rows EXACTLY for
  * every doc (asserted per run, not sampled).
  *
  * Both modes run the same segmentation/election code. Incremental =
  * B sequential batches against one store (per-batch work ~ batch
  * segments + an anti-join against stored DISTINCT segments); naive =
  * for each prefix 0..b a fresh one-shot over the union (re-segments and
  * re-elects the whole prefix: Σ prefix costs ~ quadratic in B).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SegmentDedupBench"
  * (optional args: docCounts csv, batches). Results are committed to
  * SURVEY.md §12.
  */
object SegmentDedupBench {

  private def tok(salt: String, a: Column, b: Column): Column =
    concat(lit("w"), pmod(xxhash64(lit(salt), a, b), lit(1073741824L)).cast("string"))

  /** n docs, 40 tokens: tokens 0-9 are boilerplate segment (id % 20),
    * tokens 10-39 are doc-owned.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(
            transform(sequence(lit(0), lit(9)), j => tok("boiler", col("id") % 20, j)),
            transform(sequence(lit(10), lit(39)), j => tok("own", col("id"), j)))
        ).as("text"))

  private def rmrf(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true): Unit
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Force FULL computation of every output column: count() lets the
    * optimizer prune the reassembly agg and the outer join entirely
    * (measured: "one-shot over 5M docs" in 0.14 s), which would compare
    * a real pipeline against a pruned skeleton.
    */
  private def consume(df: DataFrame): Long =
    // sum, not count: count(non-null expr) folds to count(*) and the
    // optimizer then prunes every column AND eliminates the outer join
    // against the unique-keyed aggregate — sum must evaluate the hash
    df.select(sum(xxhash64(struct(df.columns.map(col).toSeq: _*)) % 1000000007L).as("c"))
      .head().getLong(0)

  private def rowsOf(df: DataFrame): Map[Long, (Long, Long, String)] =
    df.select(col("id"), col("n_seg"), col("n_kept"), col("kept_text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  /** Frontier mode: the MARGINAL cost of one arrival at a deep history —
    * the number that actually decides the architecture (totals over a
    * short run are dominated by the cheap early prefixes). Seeds a store
    * with `history` docs, then times (a) one incremental batch of
    * `arrival` docs against it vs (b) the naive alternative, one-shot
    * re-dedup of history+arrival.
    */
  private def frontier(spark: SparkSession, base: String,
      history: Long, arrival: Long): Unit = {
    val all = corpus(spark, history + arrival)
    all.cache().count()
    val hist = all.filter(col("doc_id") < history)
    val batch = all.filter(col("doc_id") >= history)
    val store = s"$base/frontier-$history"
    consume(IncrementalSegmentDedup.segmentDedupBatch(spark, hist,
      col("doc_id"), col("text"), store, 0L))
    // batchId=1 both reps: the second run is an exact checkpoint-replay
    // (store reads exclude batch >= 1), so both reps do identical work
    val incT = (0 until 2).map { _ =>
      timed {
        consume(IncrementalSegmentDedup.segmentDedupBatch(spark, batch,
          col("doc_id"), col("text"), store, 1L))
      }._2
    }.min
    val naiveT = (0 until 2).map { _ =>
      timed { consume(Curation.segmentDedup(all, col("doc_id"), col("text"))) }._2
    }.min
    println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
      f"incr=$incT%6.2fs naive=$naiveT%6.2fs ${naiveT / incT}%5.2fx")
    all.unpersist()
    rmrf(spark, store)
  }

  /** Probe-vs-classic mode (the r16→r17 break-even re-measure): seeds a
    * store with `history` docs, then times the SAME arrival through the
    * probe-broadcast plan (`storeProbeBytesMin = 0`) and the classic
    * shuffled anti-join (`= Long.MaxValue`), 2 reps each (min), with
    * per-path job counts and the store's at-rest bytes — the gate's
    * unit. Output equality between the two paths is asserted per run.
    */
  private def probeVsClassic(spark: SparkSession, base: String,
      history: Long, arrival: Long): Unit = {
    val all = corpus(spark, history + arrival)
    all.cache().count()
    val hist = all.filter(col("doc_id") < history)
    val batch = all.filter(col("doc_id") >= history)
    val store = s"$base/probe-$history"
    consume(IncrementalSegmentDedup.segmentDedupBatch(spark, hist,
      col("doc_id"), col("text"), store, 0L))
    val storeBytes =
      graft.operators.BatchStore.priorBytes(spark, store, 1L)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def run(gate: Long): (Map[Long, (Long, Long, String)], Double, Long) = {
      var rows: Map[Long, (Long, Long, String)] = Map.empty
      var jobsUsed = 0L
      val t = (0 until 2).map { _ =>
        org.apache.spark.graft.BenchTaps.drainListenerBus(spark.sparkContext)
        val j0 = jobs.get()
        val (_, sec) = timed {
          val out = IncrementalSegmentDedup.segmentDedupBatch(spark, batch,
            col("doc_id"), col("text"), store, 1L, storeProbeBytesMin = gate)
          rows = rowsOf(out)
        }
        org.apache.spark.graft.BenchTaps.drainListenerBus(spark.sparkContext)
        jobsUsed = jobs.get() - j0
        sec
      }.min
      (rows, t, jobsUsed)
    }
    val (probeRows, probeT, probeJobs) = run(0L)
    val (classicRows, classicT, classicJobs) = run(Long.MaxValue)
    spark.sparkContext.removeSparkListener(listener)
    require(probeRows == classicRows,
      s"probe/classic outputs diverged at history=$history")
    println(f"PROBE history=$history%9d arrival=$arrival%8d " +
      f"storeMB=${storeBytes / 1048576.0}%7.1f " +
      f"probe=$probeT%6.2fs/$probeJobs%3d jobs " +
      f"classic=$classicT%6.2fs/$classicJobs%3d jobs " +
      f"${classicT / probeT}%5.2fx")
    all.unpersist()
    rmrf(spark, store)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-segment-dedup-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // local-FS deployment tuning: the incremental stores' batch= trees
      // fan 64 bucket dirs per batch, so the default threshold (32)
      // launches a parallel-listing JOB per store read — microseconds of
      // driver listing on a local filesystem, but ~4 scheduled jobs per
      // arrival of pure floor. On object storage keep the default: there
      // the parallel listing is the right plan.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("probe")) {
      val base = s"target/tmp/segdedup-probe-${System.nanoTime()}"
      val arrival = args.lift(2).map(_.toLong).getOrElse(100000L)
      args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(1000000L, 4000000L))
        .foreach(h => probeVsClassic(spark, base, h, arrival))
      rmrf(spark, base)
      spark.stop()
      return
    }
    if (args.headOption.contains("frontier")) {
      val base = s"target/tmp/segdedup-frontier-${System.nanoTime()}"
      val arrival = args.lift(2).map(_.toLong).getOrElse(100000L)
      args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(500000L, 2000000L))
        .foreach(h => frontier(spark, base, h, arrival))
      rmrf(spark, base)
      spark.stop()
      return
    }
    val sizes = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(50000L, 200000L))
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val base = s"target/tmp/segdedup-bench-${System.nanoTime()}"

    // warmup pays whole-stage-codegen once (both paths share the plans)
    IncrementalSegmentDedup.segmentDedupBatch(spark, corpus(spark, 2000L),
      col("doc_id"), col("text"), s"$base/warmup", 0L)
    rmrf(spark, s"$base/warmup")

    println(f"${"n"}%9s ${"batches"}%7s ${"incr s"}%8s ${"naive s"}%8s " +
      f"${"speedup"}%8s ${"kept segs"}%10s")
    sizes.foreach { n =>
      val docs = corpus(spark, n)
      docs.cache().count()
      val per = (n + batches - 1) / batches
      val slices = (0 until batches).map { b =>
        docs.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
      }

      var incRows: Map[Long, (Long, Long, String)] = Map.empty
      val incT = (0 until 2).map { rep =>
        val store = s"$base/incr-$n-$rep"
        incRows = Map.empty
        timed {
          slices.zipWithIndex.foreach { case (s, b) =>
            val out = IncrementalSegmentDedup.segmentDedupBatch(
              spark, s, col("doc_id"), col("text"), store, b.toLong)
            incRows ++= rowsOf(out)
            graft.operators.Checkpoints.freeFrame(out)
          }
        }._2
      }.min
      val storedSegs = IncrementalSegmentDedup
        .storedSegments(spark, s"$base/incr-$n-1").count()

      var naiveRows: Map[Long, (Long, Long, String)] = Map.empty
      val naiveT = (0 until 2).map { rep =>
        timed {
          (0 until batches).foreach { b =>
            val acc = slices.take(b + 1).reduce(_.unionByName(_))
            val out = Curation.segmentDedup(acc, col("doc_id"), col("text"))
            if (b == batches - 1) naiveRows = rowsOf(out)
            else consume(out): Unit
          }
        }._2
      }.min
      require(incRows == naiveRows,
        s"per-doc outputs diverged: ${incRows.size} vs ${naiveRows.size} docs")
      require(incRows.values.map(_._2).sum == storedSegs,
        "store segment count != total kept")

      println(f"$n%9d $batches%7d $incT%8.2f $naiveT%8.2f " +
        f"${naiveT / incT}%7.2fx $storedSegs%10d")
      docs.unpersist()
      rmrf(spark, base)
    }
    spark.stop()
  }
}
