package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump the MASKED shape string ([[graft.Bench.normalizedPlan]]
  * with `maskLiterals = true` — the exact bytes `plan_shape_hash` digests)
  * for a named query list, in a fresh session. Complements
  * [[PlanHashProbe]] (optimized canonicalized plan) and Bench's
  * `SPARK_GRAFT_PLAN_DUMP` (in-suite strings): diffing a fresh-session
  * dump against an in-suite dump is how the r14 shape-hash adjudication
  * separated code-caused drift (none) from session-state residue
  * (q_audio_energy's MapPartitions node). args: outDir queryCsv.
  */
object ShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.head
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val s = graft.Bench.normalizedPlan(
        graft.SparkEntry.queries(n)(spark, sfDir), maskLiterals = true)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.txt"), s)
    }
    spark.stop()
  }
}
