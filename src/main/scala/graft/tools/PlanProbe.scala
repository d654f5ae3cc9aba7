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
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.filter(_.contains("Exchange")).map(_.trim.take(120)).toList
      println(s"exchanges: ${exchanges.size}")
      exchanges.foreach(e => println("  " + e))
      val scans = plan.linesIterator.filter(l => l.contains("FileScan")).map(_.trim.take(160)).toList
      scans.foreach(s => println("  scan: " + s))
      val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(s"wholestage spans: $wsc")
    }
    spark.stop()
  }
}
