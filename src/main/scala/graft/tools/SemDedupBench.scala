package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, IncrementalSemDedup}

/** One-off measurement main for the PERSISTENT semantic-dedup store
  * ([[IncrementalSemDedup]]) vs the naive alternative — re-running
  * one-shot [[Embeddings.semDeDup]] over the accumulated corpus every
  * time a crawl batch lands. The last store of the family to get this
  * curve (LSH: IncrementalDedupBench; segments: SegmentDedupBench).
  *
  * Corpus: n synthetic 64-dim embeddings. The first quarter of doc ids
  * form planted clusters of ~10 IDENTICAL vectors each (cluster key =
  * id % (n/40)); the rest are independent pseudo-random vectors (random
  * 64-dim cosines concentrate near 0 — far below any dedup threshold).
  * Identical-vector clusters make the two paths' keep policies AGREE
  * (all centroid cosines tie → min id wins under both the incremental
  * first-arrival rule and the one-shot farthest-from-centroid rule), so
  * the final survivor SETS must match exactly — asserted per run, which
  * also guards the measurement against comparing diverging computations.
  *
  * Incremental = init from batch 0, then B sequential [[
  * IncrementalSemDedup.semDedupBatch]] calls against one store (per-batch
  * work ~ batch assignment + cell-scoped pairs against touched cells).
  * Naive = for each prefix 0..b a fresh one-shot over the union
  * (recomputes centroids, re-assigns, re-pairs the whole prefix:
  * Σ prefix costs ~ quadratic in B).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SemDedupBench"
  * (optional args: docCounts csv, batches; or `frontier historyCsv
  * arrival`). Results are committed to SURVEY.md §12.
  */
object SemDedupBench {

  private val Dim = 64

  /** Deterministic pseudo-random-ish unit-scale vector keyed on `key`:
    * components in [-1, 1] from xxhash64(salt, key, j).
    */
  private def vecOf(salt: String, key: Column): Column =
    transform(sequence(lit(0), lit(Dim - 1)), j =>
      ((pmod(xxhash64(lit(salt), key, j), lit(2000001L)) - lit(1000000L))
        .cast("double") / 1000000.0).cast("float"))

  /** n docs: ids below n/4 carry their CLUSTER's vector (id % (n/40) —
    * ~10 identical members per cluster); the rest carry their own.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val clusters = math.max(1L, n / 40L)
    spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id").as("vec_id"),
        when(col("id") < n / 4L, vecOf("cluster", col("id") % clusters))
          .otherwise(vecOf("own", col("id"))).as("emb"))
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

  /** Force full evaluation of every output column (the SegmentDedupBench
    * consume rationale: count() lets the optimizer prune the real work).
    */
  private def consume(df: DataFrame): Long =
    df.select(sum(xxhash64(struct(df.columns.map(col).toSeq: _*)) % 1000000007L).as("c"))
      .head().getLong(0)

  private def oneShotSurvivors(all: DataFrame, threshold: Double): DataFrame =
    Embeddings.semDeDup(all, col("vec_id"), col("emb"), threshold)
      .filter(col("keep")).select(col("vec_id"))

  /** Frontier mode: marginal cost of ONE arrival at a deep history —
    * store seeded with `history` docs, then one incremental batch of
    * `arrival` docs vs a naive one-shot re-dedup of history+arrival.
    */
  private def frontier(spark: SparkSession, base: String,
      history: Long, arrival: Long, threshold: Double): Unit = {
    val all = corpus(spark, history + arrival)
    all.cache().count()
    val hist = all.filter(col("vec_id") < history)
    val batch = all.filter(col("vec_id") >= history)
    val store = s"$base/frontier-$history"
    IncrementalSemDedup.init(hist, col("vec_id"), col("emb"), store)
    consume(IncrementalSemDedup.semDedupBatch(spark, hist,
      col("vec_id"), col("emb"), store, 0L, threshold))
    // batchId=1 both reps: an exact checkpoint-replay (store reads
    // exclude batch >= 1), so both reps do identical work
    val incT = (0 until 2).map { _ =>
      timed {
        consume(IncrementalSemDedup.semDedupBatch(spark, batch,
          col("vec_id"), col("emb"), store, 1L, threshold))
      }._2
    }.min
    val naiveT = (0 until 2).map { _ =>
      timed { consume(oneShotSurvivors(all, threshold)) }._2
    }.min
    println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
      f"incr=$incT%6.2fs naive=$naiveT%6.2fs ${naiveT / incT}%5.2fx")
    all.unpersist()
    rmrf(spark, store)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sem-dedup-bench")
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
    val threshold = 0.9
    if (args.headOption.contains("frontier")) {
      val base = s"target/tmp/semdedup-frontier-${System.nanoTime()}"
      val arrival = args.lift(2).map(_.toLong).getOrElse(50000L)
      args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(200000L, 1000000L))
        .foreach(h => frontier(spark, base, h, arrival, threshold))
      rmrf(spark, base)
      spark.stop()
      return
    }
    val sizes = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(50000L, 200000L))
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val base = s"target/tmp/semdedup-bench-${System.nanoTime()}"

    // warmup pays whole-stage-codegen once (both paths share the plans)
    val w = s"$base/warmup"
    IncrementalSemDedup.init(corpus(spark, 2000L), col("vec_id"), col("emb"), w)
    IncrementalSemDedup.semDedupBatch(spark, corpus(spark, 2000L),
      col("vec_id"), col("emb"), w, 0L, threshold)
    rmrf(spark, w)

    println(f"${"n"}%9s ${"batches"}%7s ${"incr s"}%8s ${"naive s"}%8s " +
      f"${"speedup"}%8s ${"survivors"}%10s")
    sizes.foreach { n =>
      val docs = corpus(spark, n)
      docs.cache().count()
      val per = (n + batches - 1) / batches
      val slices = (0 until batches).map { b =>
        docs.filter(col("vec_id") >= b * per && col("vec_id") < (b + 1) * per)
      }

      val incT = (0 until 2).map { rep =>
        val store = s"$base/incr-$n-$rep"
        timed {
          IncrementalSemDedup.init(slices.head, col("vec_id"), col("emb"), store)
          slices.zipWithIndex.foreach { case (s, b) =>
            consume(IncrementalSemDedup.semDedupBatch(
              spark, s, col("vec_id"), col("emb"), store, b.toLong, threshold))
            ()
          }
        }._2
      }.min
      val incSurv = IncrementalSemDedup.survivors(spark, s"$base/incr-$n-1")
        .collect().map(_.getLong(0)).toSet

      var naiveSurv: Set[Long] = Set.empty
      val naiveT = (0 until 2).map { rep =>
        timed {
          (0 until batches).foreach { b =>
            val acc = slices.take(b + 1).reduce(_.unionByName(_))
            val out = oneShotSurvivors(acc, threshold)
            if (b == batches - 1)
              naiveSurv = out.collect().map(_.getLong(0)).toSet
            else consume(out): Unit
          }
        }._2
      }.min
      require(incSurv == naiveSurv,
        s"survivor sets diverged: inc=${incSurv.size} naive=${naiveSurv.size} " +
          s"symdiff=${(incSurv diff naiveSurv).take(5)}/${(naiveSurv diff incSurv).take(5)}")

      println(f"$n%9d $batches%7d $incT%8.2f $naiveT%8.2f " +
        f"${naiveT / incT}%7.2fx ${incSurv.size}%10d")
      docs.unpersist()
      rmrf(spark, base)
    }
    spark.stop()
  }
}
