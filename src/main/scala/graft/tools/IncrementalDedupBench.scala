package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

/** One-off measurement main: what does the PERSISTENT signature store of
  * [[IncrementalDedup.lshDedupBatch]] buy over the naive alternative —
  * re-running one-shot dedup over the accumulated corpus every time a
  * new crawl batch lands?
  *
  * Corpus: n synthetic 40-token docs from pure hash-derived expressions
  * (deterministic, no driver-side data). Every 7th doc is a planted
  * near-dup of its predecessor: 35 leading tokens shared in order + 5
  * own tokens (shingle Jaccard 33/43 ≈ 0.767, comfortably above the 0.5
  * production threshold; adjacent-only pairs, so no bridge docs and the
  * incremental and one-shot survivor sets must agree EXACTLY — the tool
  * asserts it).
  *
  * Both modes run the SAME operator (same signatures, banding,
  * estimator, closure): incremental = B sequential batches against one
  * store; naive = for each prefix 0..b, one-shot over the accumulated
  * union on a throwaway store. The delta is therefore pure architecture:
  * the store amortizes signature computation and candidate generation
  * over arrivals (per-batch work ~ batch × store-candidates), while the
  * naive loop re-signs and re-self-joins the whole corpus per batch
  * (Σ prefix costs ~ quadratic in B).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IncrementalDedupBench"
  * (optional args: docCounts csv, batches). Results are committed to
  * SURVEY.md §12.
  */
object IncrementalDedupBench {

  /** Deterministic token: ~2^30 distinct values keyed on (salt, a, b). */
  private def tok(salt: String, a: Column, b: Column): Column =
    concat(lit("w"), pmod(xxhash64(lit(salt), a, b), lit(1073741824L)).cast("string"))

  /** n docs, 40 tokens each; doc d with d%7==0 (d>0) copies doc d-1's
    * first 35 tokens and owns its last 5 — a planted adjacent near-dup.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val src = when(col("id") % 7 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(
            transform(sequence(lit(0), lit(34)), j => tok("base", src, j)),
            transform(sequence(lit(35), lit(39)), j => tok("own", col("id"), j)))
        ).as("text"))
  }

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

  /** Frontier mode: the MARGINAL cost of one `arrival`-doc batch at a
    * deep accepted history — the SegmentDedupBench discipline. Seeds the
    * store with `history` docs as batch 0 (through parquet, so the band
    * self-join sees file stats, the IncrementalCurationBench rationale),
    * compacts it to the serving layout (consolidated batch + bucketed
    * band index), then times the arrival at batchId=1 twice (the second
    * rep is an exact checkpoint-replay — store reads exclude batch >= 1 —
    * so both reps do identical work) against the naive alternative:
    * one-shot re-dedup of history+arrival on a throwaway store.
    */
  private def frontier(spark: SparkSession, base: String,
      history: Long, arrival: Long, incrOnly: Boolean = false): Unit = {
    val allPath = s"$base/frontier-corpus-$history"
    corpus(spark, history + arrival)
      .write.mode("overwrite").parquet(allPath)
    val all = spark.read.parquet(allPath)
    val hist = all.filter(col("doc_id") < history)
    val batch = all.filter(col("doc_id") >= history)
    val store = s"$base/frontier-$history"
    IncrementalDedup.lshDedupBatch(spark, hist,
      col("doc_id"), col("text"), store, 0L)
    IncrementalDedup.compactStore(spark, store, upToBatch = 0L)
    val incT = (0 until 2).map { _ =>
      timed {
        IncrementalDedup.lshDedupBatch(spark, batch,
          col("doc_id"), col("text"), store, 1L).count()
      }._2
    }.min
    val incSurv = IncrementalDedup.survivors(spark, store).count()
    if (incrOnly) {
      // the naive arm (two full one-shot re-dedups of history+arrival)
      // exceeds the container's disk at this depth — measure the claim
      // under test (the incr arrival) and report it alone. NOTE: no
      // equality gate in this mode (a planted-arithmetic check would be
      // wrong — banding misses ~0.11 % of J≈0.767 pairs at (64,16),
      // identically in both arms, which is exactly why the normal mode
      // gates on incr == naive rather than on the planted count);
      // correctness is carried by the gated rungs below this depth.
      println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
        f"incr=$incT%7.2fs naive=   SKIPPED (disk)        " +
        f"survivors=$incSurv%9d")
    } else {
      val naiveT = (0 until 2).map { rep =>
        val os = s"$base/frontier-naive-$history-$rep"
        timed {
          IncrementalDedup.lshDedupBatch(spark, all,
            col("doc_id"), col("text"), os, 0L).count()
        }._2
      }.min
      val naiveSurv = IncrementalDedup.survivors(
        spark, s"$base/frontier-naive-$history-1").count()
      require(incSurv == naiveSurv,
        s"survivor sets diverged: incremental $incSurv vs one-shot $naiveSurv")
      println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
        f"incr=$incT%7.2fs naive=$naiveT%7.2fs ${naiveT / incT}%5.2fx " +
        f"survivors=$incSurv%9d")
    }
    rmrf(spark, base)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-incremental-dedup-bench")
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
    if (args.headOption.contains("frontier-chunked")) {
      // CHUNKED SEEDING rung (the r15 16M blocker): build a `history`-doc
      // store single-node as ceil(history/chunkDocs) id-ordered arrivals
      // through seedLshChunked — no one-shot self-join ever holds the
      // full corpus's pair set, so the fd-exhausting sort-spill merge of
      // the 16M one-shot seed never forms. Gate: the chunked store's
      // survivor SET equals a 2-chunk composition of the same corpus
      // (the half→+half shape, each half itself seedable one-shot on
      // this container), then time one `arrival`-doc batch at full
      // depth. args: frontier-chunked [history] [chunkDocs] [arrival].
      val history = args.lift(1).map(_.toLong).getOrElse(16000000L)
      val chunkDocs = args.lift(2).map(_.toLong).getOrElse(2000000L)
      val arrival = args.lift(3).map(_.toLong).getOrElse(100000L)
      val base = s"target/tmp/inc-bench-chunked-${System.nanoTime()}"
      IncrementalDedup.lshDedupBatch(spark, corpus(spark, 2000L),
        col("doc_id"), col("text"), s"$base/warmup", 0L)
      rmrf(spark, s"$base/warmup")
      val allPath = s"$base/corpus"
      corpus(spark, history + arrival)
        .write.mode("overwrite").parquet(allPath)
      val all = spark.read.parquet(allPath)
      val hist = all.filter(col("doc_id") < history)
      val batch = all.filter(col("doc_id") >= history)
      val chunks = ((history + chunkDocs - 1) / chunkDocs).toInt
      val storeA = s"$base/chunked"
      val (lastA, seedAT) = timed {
        IncrementalDedup.seedLshChunked(spark, hist,
          col("doc_id"), col("text"), storeA, chunks)
      }
      val survA = IncrementalDedup.survivors(spark, storeA).count()
      println(f"CHUNKED-SEED history=$history%9d chunks=$chunks%3d " +
        f"seed=$seedAT%8.1fs survivors=$survA%9d")
      val storeB = s"$base/half"
      val (_, seedBT) = timed {
        IncrementalDedup.seedLshChunked(spark, hist,
          col("doc_id"), col("text"), storeB, chunks = 2)
      }
      val survB = IncrementalDedup.survivors(spark, storeB).count()
      val aIds = IncrementalDedup.survivors(spark, storeA).select("doc_id")
      val bIds = IncrementalDedup.survivors(spark, storeB).select("doc_id")
      val diff = aIds.join(bIds, Seq("doc_id"), "left_anti").count() +
        bIds.join(aIds, Seq("doc_id"), "left_anti").count()
      require(diff == 0 && survA == survB,
        s"chunked compositions diverged: $chunks-chunk $survA vs 2-chunk " +
          s"$survB, symmetric diff $diff")
      println(f"HALF-SEED    history=$history%9d chunks=  2 " +
        f"seed=$seedBT%8.1fs survivors=$survB%9d (sets equal)")
      rmrf(spark, storeB)
      rmrf(spark, storeB + "__bands")
      val incT = (0 until 2).map { _ =>
        timed {
          IncrementalDedup.lshDedupBatch(spark, batch,
            col("doc_id"), col("text"), storeA, lastA + 1).count()
        }._2
      }.min
      val survFinal = IncrementalDedup.survivors(spark, storeA).count()
      println(f"ARRIVAL      history=$history%9d arrival=$arrival%8d " +
        f"incr=$incT%7.2fs survivors=$survFinal%9d")
      rmrf(spark, base)
      spark.stop()
      return
    }
    if (args.headOption.exists(_.startsWith("frontier"))) {
      // "frontier-incr": measure the incremental arrival alone (the
      // naive arm's two full one-shot stores exceed disk at 16M+);
      // survivor correctness holds via the planted arithmetic either way
      val incrOnly = args.headOption.contains("frontier-incr")
      val base = s"target/tmp/inc-bench-frontier-${System.nanoTime()}"
      val arrival = args.lift(2).map(_.toLong).getOrElse(100000L)
      // warmup (codegen costs out of the first measured rung)
      IncrementalDedup.lshDedupBatch(spark, corpus(spark, 2000L),
        col("doc_id"), col("text"), s"$base/warmup", 0L)
      rmrf(spark, s"$base/warmup")
      args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(1000000L, 2000000L, 4000000L, 8000000L))
        .foreach(h => frontier(spark, base, h, arrival, incrOnly))
      rmrf(spark, base)
      spark.stop()
      return
    }
    val sizes = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(20000L, 50000L))
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val base = s"target/tmp/inc-bench-${System.nanoTime()}"

    // warmup: one throwaway run pays the whole-stage-codegen cost so the
    // first measured row isn't charged for janino (the incremental path
    // runs first and was ~5 s slower than steady-state without this)
    IncrementalDedup.lshDedupBatch(spark, corpus(spark, 2000L),
      col("doc_id"), col("text"), s"$base/warmup", 0L)
    rmrf(spark, s"$base/warmup")

    println(f"${"n"}%9s ${"batches"}%7s ${"incr s"}%8s ${"naive s"}%8s " +
      f"${"speedup"}%8s ${"survivors"}%9s")
    sizes.foreach { n =>
      val docs = corpus(spark, n)
      docs.cache().count() // generation cost out of both measured paths
      val per = (n + batches - 1) / batches
      val slices = (0 until batches).map { b =>
        docs.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per)
      }

      // min of 2 full repetitions per path (fresh stores each rep):
      // single runs swing tens of percent with GC/compaction luck
      val incT = (0 until 2).map { rep =>
        val incStore = s"$base/incr-$n-$rep"
        timed {
          slices.zipWithIndex.foreach { case (s, b) =>
            IncrementalDedup.lshDedupBatch(spark, s, col("doc_id"), col("text"),
              incStore, b.toLong)
          }
        }._2
      }.min
      val incSurv = IncrementalDedup.survivors(spark, s"$base/incr-$n-1")
        .count()

      val naiveT = (0 until 2).map { rep =>
        timed {
          (0 until batches).foreach { b =>
            val acc = slices.take(b + 1).reduce(_.unionByName(_))
            IncrementalDedup.lshDedupBatch(spark, acc, col("doc_id"), col("text"),
              s"$base/naive-$n-$rep-$b", 0L)
          }
        }._2
      }.min
      val naiveSurv = IncrementalDedup.survivors(
        spark, s"$base/naive-$n-1-${batches - 1}").count()
      require(incSurv == naiveSurv,
        s"survivor sets diverged: incremental $incSurv vs one-shot $naiveSurv")

      println(f"$n%9d $batches%7d $incT%8.2f $naiveT%8.2f " +
        f"${naiveT / incT}%7.2fx $incSurv%9d")
      docs.unpersist()
      rmrf(spark, base)
    }
    spark.stop()
  }
}
