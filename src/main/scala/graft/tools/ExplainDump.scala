package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for registered queries — the physical
  * plan with the numbered operator list, PushedFilters/ReadSchema,
  * Exchange placement, and join strategies. The r17 optimization round's
  * evidence files (`plans/r17/<query>_{before,after}.txt`) are written
  * with this.
  *
  * args: outDir [suffix] [names-csv]
  *
  * Writes `<outDir>/<name>_<suffix>.txt` (suffix defaults to "plan").
  * Formatted-mode explain renders the INITIAL physical plan (AQE not yet
  * executed) — exactly what `df.explain("formatted")` prints.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: ExplainDump <outDir> [suffix] [names-csv]\n" +
          "note: queries with eager builders (materializeScratch, trained\n" +
          "constants) execute real jobs at $SPARK_GRAFT_SF_DIR during the dump")
      sys.exit(2)
    }
    val out = args.head
    val suffix = args.lift(1).getOrElse("plan")
    val names = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val mode = ExplainMode.fromString("formatted")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/${n}_$suffix.txt"),
          df.queryExecution.explainString(mode))
        println(s"[explain] wrote $n")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
