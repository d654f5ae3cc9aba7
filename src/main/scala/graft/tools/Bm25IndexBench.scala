package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** One-off measurement main for the PERSISTENT BM25 index
  * ([[Retrieval.buildIndex]] family) — the last incremental store
  * without a measured cost curve (LSH / segment / semantic stores each
  * have one; the BM25 index had only the bit-for-bit append==rebuild
  * spec).
  *
  * Two questions, two modes:
  *
  *  - '''frontier''' (default): the MARGINAL cost of one crawl batch at
  *    a deep history — [[Retrieval.appendIndex]] of the arrival (one
  *    tokenize pass over the batch, additive stats) vs the naive
  *    alternative, [[Retrieval.buildIndex]] full re-index of
  *    history+arrival. Answers over the appended index and the rebuilt
  *    index are asserted EQUAL for a fixed query set (the RetrievalSpec
  *    bit-for-bit contract, re-checked here at scale).
  *  - '''serving''': query latency decay as append-many accumulates
  *    `batch=` partitions (per-batch listing + one parquet footer per
  *    tiny file on every query), and what [[Retrieval.compactIndex]]
  *    buys back. History lands in B append batches, a fixed query set
  *    is timed, the index is compacted, the same queries re-timed —
  *    with data-file counts before/after. Query answers asserted
  *    identical across the compaction.
  *
  * Corpus: n synthetic 60-token docs. Every 10th position draws from a
  * 100-term HEAD vocabulary (heavy posting lists — the stopword shape),
  * the rest from a 30,000-term tail (df ≈ n·54/30000). Queries mix one
  * head + two tail terms, the realistic BM25 query profile (one hot
  * posting list, two selective ones).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Bm25IndexBench"
  * (args: [frontier historyCsv arrival] | [serving n batches]).
  * Results are committed to SURVEY.md §15.
  */
object Bm25IndexBench {

  /** n docs, 60 tokens: position j ≡ 0 (mod 10) is head vocab h0..h99,
    * else tail vocab w0..w29999.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(0), lit(59)), j =>
            when(j % 10 === 0,
              concat(lit("h"), pmod(xxhash64(col("id"), j), lit(100)).cast("string")))
            .otherwise(
              concat(lit("w"), pmod(xxhash64(col("id"), j), lit(30000)).cast("string"))))
        ).as("text"))

  private val Queries: Seq[Seq[String]] = Seq(
    Seq("h7", "w123", "w4567"),
    Seq("h42", "w999", "w17001"),
    Seq("h0", "w25000", "w31"))

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

  private def answers(
      spark: SparkSession, path: String): Seq[Seq[(Long, Double)]] =
    Queries.map(q => Retrieval.queryIndex(spark, path, q)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq) // (rk, doc_id, bm25)

  private def dataFiles(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  private def frontier(spark: SparkSession, base: String,
      history: Long, arrival: Long): Unit = {
    val all = corpus(spark, history + arrival)
    all.cache().count()
    val hist = all.filter(col("doc_id") < history)
    val batch = all.filter(col("doc_id") >= history)
    val incrPath = s"$base/incr-$history"
    val (_, seedT) = timed {
      Retrieval.buildIndex(hist, col("doc_id"), col("text"), incrPath)
    }
    // batchId=1 both reps: the second run is an exact checkpoint-replay
    // (overwrites its own partitions), so both reps do identical work
    val incT = (0 until 2).map { _ =>
      timed {
        Retrieval.appendIndex(batch, col("doc_id"), col("text"), incrPath,
          batchId = 1L)
      }._2
    }.min
    val fullPath = s"$base/full-$history"
    val naiveT = (0 until 2).map { _ =>
      timed {
        Retrieval.buildIndex(all, col("doc_id"), col("text"), fullPath)
      }._2
    }.min
    require(answers(spark, incrPath) == answers(spark, fullPath),
      "appended index and full rebuild disagree on query answers")
    println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
      f"seed=$seedT%6.1fs incr=$incT%6.2fs naive=$naiveT%6.2fs " +
      f"${naiveT / incT}%5.2fx")
    all.unpersist()
    rmrf(spark, incrPath)
    rmrf(spark, fullPath)
  }

  private def serving(spark: SparkSession, base: String,
      n: Long, batches: Int): Unit = {
    val docs = corpus(spark, n)
    docs.cache().count()
    val path = s"$base/serving-$n"
    val per = (n + batches - 1) / batches
    Retrieval.ensureIndexMeta(spark, path, buckets = 64)
    (0 until batches).foreach { b =>
      Retrieval.appendIndex(
        docs.filter(col("doc_id") >= b * per && col("doc_id") < (b + 1) * per),
        col("doc_id"), col("text"), path, batchId = b.toLong)
    }
    val before = answers(spark, path) // pay codegen/listing warmup once
    val filesBefore = dataFiles(spark, path)
    val qBefore = (0 until 3).map(_ => timed(answers(spark, path))._2).min
    // SAFETY CONTRACT: compact only committed batches — all of them are
    // here (the producer loop above has returned)
    Retrieval.compactIndex(spark, path, upToBatch = batches - 1L)
    val filesAfter = dataFiles(spark, path)
    val after = answers(spark, path)
    require(before == after, "compaction changed query answers")
    val qAfter = (0 until 3).map(_ => timed(answers(spark, path))._2).min
    println(f"SERVING n=$n%9d batches=$batches%4d " +
      f"files $filesBefore%5d -> $filesAfter%4d " +
      f"query ${qBefore * 1000}%7.0fms -> ${qAfter * 1000}%6.0fms " +
      f"(${qBefore / qAfter}%4.2fx)")
    docs.unpersist()
    rmrf(spark, path)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bm25-index-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"target/tmp/bm25-bench-${System.nanoTime()}"
    if (args.headOption.contains("serving")) {
      val n = args.lift(1).map(_.toLong).getOrElse(500000L)
      val batches = args.lift(2).map(_.toInt).getOrElse(64)
      serving(spark, base, n, batches)
    } else {
      val arrival = args.lift(2).map(_.toLong).getOrElse(100000L)
      args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
        .getOrElse(Seq(500000L, 2000000L))
        .foreach(h => frontier(spark, base, h, arrival))
    }
    rmrf(spark, base)
    spark.stop()
  }
}
