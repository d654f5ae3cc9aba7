package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         t <- Seq(0.6, 0.7, 0.8)) {
      val docs = graft.Tables.wide(spark, dir, "documents")
      val ex = docs.select($"doc_id".as("__id"),
          graft.operators.Dedup.wordShingles($"text", 3).as("__sh"))
        .select($"__id", size($"__sh").as("__n"), explode_outer($"__sh").as("__s"))
      val cand = graft.operators.Dedup.prefixCandidates(ex, t).count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.prefixJaccardPairs(docs, $"doc_id", $"text", t).count()
      val secs = (System.nanoTime()-t0)/1e9
      println(f"PROBE $dir t=$t cand=$cand pairs=$pairs e2e=$secs%.2f s")
    }
    spark.stop()
  }
}
