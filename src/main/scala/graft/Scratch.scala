package graft

// Temporary profiling harness — not part of the library; deleted before the
// round closes.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def skeleton(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $name ==")
      p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan parquet") ||
          l.contains("QueryStage") || l.contains("Window")).foreach(l =>
        println(l.replaceAll("\\[plan_id=\\d+\\]", "").take(150)))
    }
    skeleton(queries.EmbeddingQueries.embeddingKnn(spark, dir), "knn")
    skeleton(queries.EmbeddingQueries.embeddingAnn(spark, dir), "ann")
    spark.stop()
  }
}
