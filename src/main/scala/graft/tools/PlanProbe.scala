package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // execute first: under AQE, codegen collapse and stage plans only
      // exist after materialization
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).map(_.trim.take(120)).toList
      println(s"exchanges: ${exchanges.size}")
      exchanges.foreach(e => println("  " + e))
      val scans = plan.linesIterator.filter(l => l.contains("FileScan")).map(_.trim.take(160)).toList
      scans.foreach(s => println("  scan: " + s))
      // executedPlan.toString renders codegen spans as "*(n)" prefixes,
      // not the class name — count the actual exec nodes, descending
      // through AQE wrappers (collect() does not)
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: allNodes(q.plan)
        case other => other +: other.children.flatMap(allNodes)
      }
      val wsc = allNodes(df.queryExecution.executedPlan).count {
        case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
        case _ => false
      }
      println(s"wholestage spans: $wsc")
    }
    spark.stop()
  }
}
