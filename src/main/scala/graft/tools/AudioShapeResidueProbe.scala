package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic for in-suite plan_shape_hash drift (found the r16
  * q_audio_energy LambdaVariable-id residue; generalized for the
  * q_langid_confusion hunt): build the frame FRESH, then execute a
  * slice of the suite (including the query itself, as Bench does), then
  * build it AGAIN and dump both the masked shape string and the exact
  * normalized string. If the strings differ, the diff names the session
  * residue byte-for-byte. args: outDir [queryName] [sliceCsv].
  */
object AudioShapeResidueProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = args.head
    val target = args.lift(1).getOrElse("q_audio_energy")
    // "prefix" = every registered query alphabetically before the target —
    // exactly the execution history Bench has when it builds the target's
    // cold frame (the frame the hashes are computed from)
    val slice = args.lift(2) match {
      case Some("prefix") =>
        graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ < target)
      case Some(csv) => csv.split(",").toSeq
      case None => Seq(
        "q_image_dims", "q_media_meta", "q_audio_energy",
        "q_binary_stats", "q_exact_dedup", "q_clean_text")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def dump(tag: String): Unit = {
      val df = graft.SparkEntry.queries(target)(spark, sfDir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$tag.shape.txt"),
        graft.Bench.normalizedPlan(df, maskLiterals = true))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/$tag.exact.txt"),
        graft.Bench.normalizedPlan(df))
    }
    dump("before")
    // execute a suite slice the way Bench does (xor-materialize)
    slice.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      import org.apache.spark.sql.functions._
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toSeq: _*)))).collect()
    }
    dump("after")
    spark.stop()
  }
}
