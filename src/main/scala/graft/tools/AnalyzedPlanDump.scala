package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: dump the EXACT normalized analyzed-plan string
  * the Bench plan_hash is computed over, for run-to-run diffing.
  * args: outDir [queryCsv]
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
      import org.apache.spark.sql.catalyst.expressions.{And, Expression}
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      def norm(e: Expression): Expression = {
        val k = e.mapChildren(norm)
        k match {
          case a: And =>
            conjuncts(a).sortBy(_.toString).reduceLeft(And(_, _))
          case x => x
        }
      }
      val p = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.analyzed
        .canonicalized.transformAllExpressions { case e => norm(e) }
      val s = p.toString
        .replaceAll("Lambda\\$\\d+", "Lambda")
        .replaceAll("/0x[0-9a-f]+", "")
        .replaceAll("@[0-9a-f]+", "")
        .replaceAll("\\bRepartition (\\d+)", "Repartition P")
        .replaceAll("(\\bRepartitionByExpression\\b[^\\n]*?), \\d+", "$1, P")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/$n.txt"), s)
    }
    spark.stop()
  }
}
