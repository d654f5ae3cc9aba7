package graft.tools
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.collect()
        (System.nanoTime()-t0)/1e9
      }
      val times = (1 to 4).map(_ => once())
      println(f"PROBE $name cold=${times.head}%.2f steady=${times.tail.min}%.2f")
    }
    spark.stop()
  }
}
