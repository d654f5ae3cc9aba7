package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic for the r16 q_audio_energy plan_shape_hash
  * drift: build the frame FRESH, then execute a slice of the suite
  * (including q_audio_energy itself, as Bench does), then build it
  * AGAIN and diff both the masked shape string and the exact
  * normalized string. If the strings differ, the diff names the
  * session residue byte-for-byte. args: outDir.
  */
object AudioShapeResidueProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def dump(tag: String): Unit = {
      val df = graft.SparkEntry.queries("q_audio_energy")(spark, sfDir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$tag.shape.txt"),
        graft.Bench.normalizedPlan(df, maskLiterals = true))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$tag.exact.txt"),
        graft.Bench.normalizedPlan(df))
    }
    dump("before")
    // execute a suite slice the way Bench does (xor-materialize),
    // including the audio query itself and its multimodal siblings
    val slice = Seq("q_image_dims", "q_media_meta", "q_audio_energy",
      "q_binary_stats", "q_exact_dedup", "q_clean_text")
    slice.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      import org.apache.spark.sql.functions._
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toSeq: _*)))).collect()
    }
    dump("after")
    spark.stop()
  }
}
