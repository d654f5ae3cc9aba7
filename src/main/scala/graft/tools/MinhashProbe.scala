package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the MinHash verification rewrite (round 9):
  * compares the retired array-freight candidate join (shingle arrays
  * duplicated across all 16 band rows, two arrays per candidate pair into
  * array_intersect) against the shipped count-based shape
  * ([[graft.operators.Dedup.minHashNearDuplicates]]) on shuffle WRITE
  * bytes and wall-clock. Numbers quoted in SURVEY §2 / the commit message.
  */
object MinhashProbe {

  /** The pre-round-9 verification, reconstructed inline for comparison. */
  private def arrayFreight(
      df: DataFrame, id: Column, text: Column,
      threshold: Double, k: Int, bands: Int, shingleLen: Int,
      seed: Long): DataFrame = {
    import graft.operators.Dedup
    val base = df.select(id.as("__id"), Dedup.tokens(text).as("__toks"))
      .filter(size(col("__toks")) >= shingleLen)
      .select(col("__id"),
        Dedup.shinglesOfTokens(col("__toks"), shingleLen).as("__sh"))
      .withColumn("__sig", Dedup.minHashSignature(col("__sh"), k, seed))
      .withColumn("__band", explode_outer(Dedup.lshBandHashes(col("__sig"), k, bands)))
    val a = base.select(col("__id").as("id_a"), col("__sh").as("sh_a"), col("__band"))
    val b = base.select(col("__id").as("id_b"), col("__sh").as("sh_b"), col("__band"))
    a.join(b, Seq("__band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("jaccard")).as("jaccard"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val shuffleWrite = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.Tables.wide(spark, dir, "documents")
      for ((label, run) <- Seq[(String, () => Long)](
        ("array-freight", () => arrayFreight(
          docs, $"doc_id", $"text", 0.5, 64, 16, 3, 42L).count()),
        ("count-based", () => graft.operators.Dedup.minHashNearDuplicates(
          docs, $"doc_id", $"text", 0.5).count()))) {
        run() // warm
        shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        val n = run()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(1000)
        println(f"PROBE $dir $label pairs=$n shuffleWrite=${shuffleWrite.get()}%,d B e2e=$secs%.2f s")
      }
    }
    spark.stop()
  }
}
