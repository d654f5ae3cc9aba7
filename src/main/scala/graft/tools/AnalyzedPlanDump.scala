package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: dump the EXACT normalized analyzed-plan string
  * the Bench plan_hash is computed over ([[graft.Bench.normalizedPlan]]
  * — shared, so the dump can never drift from what is hashed), for
  * run-to-run / cross-environment diffing. This is the tool that
  * attributed the round-10 56/97 hash flip to environment-derived
  * Repartition widths. args: outDir [queryCsv]
  */
object AnalyzedPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = args.head
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.txt"),
        graft.Bench.normalizedPlan(df))
      // the literal-masked SHAPE string (digested as plan_shape_hash) —
      // dumped beside the exact string so a cross-parallelism diff can
      // show the shape stable while exact literals move
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.shape.txt"),
        graft.Bench.normalizedPlan(df, maskLiterals = true))
    }
    spark.stop()
  }
}
