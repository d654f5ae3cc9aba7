package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Checkpoints, Dedup, IncrementalDedup}

/** Throwaway diagnostic for the 8.3 GiB broadcast failure inside the
  * one-shot composed arm at n=500k: reruns the failing lshDedupBatch
  * with broadcast joins disabled to isolate the join, then prints the
  * executed plan of the batch's nnEdges-equivalent frame under default
  * thresholds for inspection. args: [n] [mode=off|on]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val mode = args.lift(1).getOrElse("off")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (mode == "off") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val work = java.nio.file.Files.createTempDirectory("ccprobe").toString
    val normed = Checkpoints.materializeFrame(
      IncrementalDedupBench.corpus(spark, n)
        .select(col("doc_id"),
          TextFunctions.redactPii(TextFunctions.nfcNormalize(col("text"))).as("r")))
    val corpus = normed.filter(col("doc_id") % 23 =!= 0)
    val exDeduped = Checkpoints.materializeFrame(
      Dedup.exact(corpus, lower(TextFunctions.pyStrip(col("r"))),
        col("doc_id"), payload = Seq("doc_id", "r")))
    if (mode == "plan") {
      // replicate lshDedupBatch's nnEdges + the CC entry frame and print
      // the PLANNED join strategies without executing
      val k = 64; val bands = 16; val shingleLen = 3; val seed = 42L
      val keyed = exDeduped.select(col("doc_id"), col("r").as("text"))
        .withColumn("__toks", Dedup.tokens(col("text")))
      val banded = Checkpoints.materializeFrame(
        keyed.filter(size(col("__toks")) >= shingleLen)
          .select(col("doc_id"), col("text"),
            Dedup.shinglesOfTokens(col("__toks"), shingleLen).as("__sh"))
          .withColumn("sig", Dedup.minHashSignature(col("__sh"), k, seed))
          .select(col("doc_id"), col("text"), col("sig"),
            Dedup.lshBandHashes(col("sig"), k, bands).as("bands")))
      val nEx = banded.select(col("doc_id"), col("sig"), explode(col("bands")).as("__b"))
      val nnEdges = nEx.as("x").join(nEx.as("y"),
          col("x.__b") === col("y.__b") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("x.sig").as("__sa"),
          col("y.doc_id").as("b"), col("y.sig").as("__sb"))
        .distinct()
        .filter(IncrementalDedup.estimatedJaccard(col("__sa"), col("__sb"), k) >= 0.5)
        .select(col("a"), col("b"))
      val canon = nnEdges.select(
          greatest(col("a").cast("long"), col("b").cast("long")).as("a"),
          least(col("a").cast("long"), col("b").cast("long")).as("b"))
        .filter(col("a") =!= col("b"))
      println("=== nnEdges-canonical executedPlan join/exchange nodes ===")
      canon.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Broadcast"))
        .foreach(println)
      println("=== full plan head ===")
      println(canon.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    } else {
      val t0 = System.nanoTime()
      val surv = IncrementalDedup.lshDedupBatch(
          spark, exDeduped, col("doc_id"), col("r"), s"$work/os", batchId = 0L)
        .filter(col("survivor"))
      println(s"SURVIVORS=${surv.count()} wall=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
