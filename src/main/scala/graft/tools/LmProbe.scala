package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timings for the bigram-LM query. */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.wide(spark, dir, "documents")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    // warm
    val lmW = graft.operators.NgramLm.train(docs, "text")
    graft.operators.NgramLm.score(docs, "text", lmW, Seq("doc_id", "source")).count()
    graft.queries.TextQueries.bigramLm(spark, dir).collect()
    t("registered")(graft.queries.TextQueries.bigramLm(spark, dir).collect())
    val lm = t("train")(graft.operators.NgramLm.train(docs, "text"))
    t("score")(graft.operators.NgramLm.score(docs, "text", lm, Seq("doc_id", "source")).count())
    t("score2")(graft.operators.NgramLm.score(docs, "text", lm, Seq("doc_id", "source")).count())
    // train sub-phases
    val uni = docs.select(explode(
      regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    t("uni+limit")(uni.orderBy($"c".desc, $"w").limit(4096).collect())
    t("uni+limit2")(uni.orderBy($"c".desc, $"w").limit(4096).collect())
    spark.stop()
  }
}
