package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalImageDedup

/** One-off measurement main for the PERSISTENT perceptual image store
  * ([[IncrementalImageDedup]]) vs the naive alternative — re-running the
  * one-shot dedup over the accumulated corpus every time a crawl batch of
  * media lands. Completes the incremental-store measurement family (LSH /
  * segment / semantic / BM25 all have curves; the image store had only
  * its suppression/replay/compaction specs).
  *
  * Corpus: n synthetic 9×8 BMPs (the [[graft.operators.Multimodal]] REAL
  * decode path — every image is actually decoded by ImageIO and dHashed
  * on an executor). The first quarter of ids land in planted clusters of
  * ~10 IDENTICAL images (pattern seed = id % (n/40)); the rest carry
  * unique pseudo-random gradient patterns. The bench runs at
  * `maxHamming = 0` (exact perceptual dups): hash equality is
  * TRANSITIVE, so the incremental and one-shot keep policies agree and
  * the final survivor SETS must match exactly — asserted per run. The
  * banding / store-join / CC machinery exercised is identical to the
  * near-dup radius; only the verification threshold differs.
  *
  * Incremental = seed the store with the history (one batch), then time
  * one arrival batch against it (per-batch work ~ decode the arrival +
  * band-join against stored DISTINCT hashes). Naive = one-shot over
  * history+arrival on a fresh store (re-decodes and re-joins the whole
  * corpus). Decode cost is common to both sides by construction; the
  * store's point is never re-touching accepted payloads.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ImageDedupBench"
  * (args: historyCsv arrival). Results are committed to SURVEY.md §15.
  */
object ImageDedupBench {

  /** 54-byte BITMAPINFOHEADER BMP header for 9×8 24-bit bottom-up, file
    * size 0x116 — byte-identical to the test fixture generator's.
    */
  private val Header: Array[Byte] =
    ("424D16010000000000003600000028000000" +
      "0900000008000000" + "01001800" + "00000000" + "E0000000" +
      "130B0000130B0000" + "0000000000000000")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 9×8 24-bit BMP whose gradient-sign pattern is the 64 bits of
    * `splitmix64(seed)` — decoded luma equals the pixel value at the 1:1
    * grid, so the image's dHash64 is exactly that bit pattern.
    */
  private def bmpOf(seed: Long): Array[Byte] = {
    val bits = splitmix64(seed)
    val out = new Array[Byte](Header.length + 8 * (9 * 3 + 1))
    System.arraycopy(Header, 0, out, 0, Header.length)
    var o = Header.length
    var ys = 0
    while (ys < 8) {
      val y = 7 - ys // bottom-up row order
      var v = 128
      var x = 0
      // column 0 then the 8 signed gradient steps
      while (x <= 8) {
        val b = v.toByte
        out(o) = b; out(o + 1) = b; out(o + 2) = b
        o += 3
        if (x < 8) v += (if (((bits >>> (y * 8 + x)) & 1L) == 1L) 2 else -2)
        x += 1
      }
      out(o) = 0 // row pad to 4-byte boundary (27 -> 28)
      o += 1
      ys += 1
    }
    out
  }

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val quarter = n / 4
    val clusters = math.max(1L, n / 40)
    spark.range(n)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { id =>
        val seed = if (id < quarter) id % clusters else id
        (id, bmpOf(seed))
      }
      .toDF("media_id", "payload")
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

  private def consume(df: DataFrame): Long =
    df.select(sum(xxhash64(col("media_id"), col("rep_id"),
      col("survivor").cast("int")) % 1000000007L)).head().getLong(0)

  private def frontier(spark: SparkSession, base: String,
      history: Long, arrival: Long): Unit = {
    val all = corpus(spark, history + arrival)
    all.cache().count()
    val hist = all.filter(col("media_id") < history)
    val batch = all.filter(col("media_id") >= history)
    val store = s"$base/frontier-$history"
    consume(IncrementalImageDedup.dhashDedupBatch(spark, hist,
      col("media_id"), col("payload"), store, 0L, maxHamming = 0))
    // batchId=1 both reps: the second run is an exact checkpoint-replay
    val incT = (0 until 2).map { _ =>
      timed {
        consume(IncrementalImageDedup.dhashDedupBatch(spark, batch,
          col("media_id"), col("payload"), store, 1L, maxHamming = 0))
      }._2
    }.min
    val naiveT = (0 until 2).map { rep =>
      val fresh = s"$base/naive-$history-$rep"
      timed {
        consume(IncrementalImageDedup.dhashDedupBatch(spark, all,
          col("media_id"), col("payload"), fresh, 0L, maxHamming = 0))
      }._2
    }.min
    // exact-hash dedup is transitive: survivor sets must agree exactly
    val incSurv = IncrementalImageDedup.survivors(spark, store)
      .collect().map(_.getLong(0)).toSet
    val naiveSurv = IncrementalImageDedup.survivors(spark, s"$base/naive-$history-1")
      .collect().map(_.getLong(0)).toSet
    require(incSurv == naiveSurv,
      s"survivor sets diverged: ${incSurv.size} vs ${naiveSurv.size}")
    println(f"FRONTIER history=$history%9d arrival=$arrival%8d " +
      f"incr=$incT%6.2fs naive=$naiveT%6.2fs ${naiveT / incT}%5.2fx " +
      f"survivors=${incSurv.size}%d")
    all.unpersist()
    rmrf(spark, store)
    (0 until 2).foreach(r => rmrf(spark, s"$base/naive-$history-$r"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-image-dedup-bench")
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
    val base = s"target/tmp/imgdedup-bench-${System.nanoTime()}"
    val arrival = args.lift(1).map(_.toLong).getOrElse(50000L)
    args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 1000000L))
      .foreach(h => frontier(spark, base, h, arrival))
    rmrf(spark, base)
    spark.stop()
  }
}
