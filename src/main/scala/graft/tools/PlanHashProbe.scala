package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: dump canonicalized optimized plans for the
  * queries whose plan_hash was unstable across JVM runs, to find the
  * nondeterministic fragment. args: outDir [queryCsv]
  */
object PlanHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val out = args.head
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "q_audio_energy", "q_bpe_token_stats", "q_decontaminate_bloom",
      "q_inverted_index", "q_langid_confusion", "q_profile_orders",
      "q_simhash_pairs", "q_token_packing", "q_topk_bounded",
      "q_weighted_sample_group"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.optimizedPlan.canonicalized.toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.txt"), plan)
    }
    spark.stop()
  }
}
