package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Checkpoints

/** Diagnostic: isolate the CurationScaleBench quality_gate stage — is
  * its superlinear wall time the operator (regex counts over text) or
  * the harness (localCheckpoint storage pressure by the fourth
  * materialized frame)? Times the SAME projection (a) over a fresh
  * checkpointed frame as the only block-holder in the JVM, and (b) the
  * count-only form without materializing the result.
  */
object QgProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-qg-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[qgprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
      a
    }

    val base = IncrementalDedupBench.corpus(spark, n)
      .select(col("doc_id"),
        TextFunctions.redactPii(TextFunctions.nfcNormalize(col("text"))).as("r"))
    val decon = timed("materialize input")(Checkpoints.materializeFrame(base))
    println(s"[qgprobe] rows=${decon.count()}")

    timed("baseline count")(decon.count())
    timed("length sum")(
      decon.select(sum(length(col("r")))).head())
    timed("regexp_count \\S+")(
      decon.select(sum(regexp_count(col("r"), lit("\\S+")))).head())
    timed("regexp_count punct")(
      decon.select(sum(regexp_count(col("r"), lit("[^A-Za-z0-9\\s]")))).head())
    timed("size(split) tokens")(
      decon.select(sum(size(split(col("r"), "\\s+")))).head())

    def gate = {
      val nt = TextFunctions.tokenCount(col("r")).cast("long")
      decon.select(col("doc_id"), nt.as("n_tokens"),
          TextFunctions.punctCount(col("r")).cast("long").as("__np"))
        .filter(col("n_tokens") >= 20 && col("__np") <= col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"))
    }
    gate.explain("formatted")
    timed("gate count-only")(gate.count())
    Checkpoints.freeFrame(decon)
    spark.stop()
  }
}
