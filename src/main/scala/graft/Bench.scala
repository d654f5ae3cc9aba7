package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Materialization: a bare `.count()` lets Catalyst column-prune pure
  * projections down to a row count (the regex/fold work never runs), which
  * flattered the text queries in earlier rounds. Instead we aggregate
  * xxhash64 over a struct of ALL output columns — every expression in the
  * query must actually be evaluated for every row, while the result stays a
  * single driver-side long (no collect of real data).
  *
  * The fold is `bit_xor`, not `sum`: xxhash64 yields uniformly distributed
  * 64-bit values, so a running Long sum overflows almost surely under
  * Spark 4's default ANSI mode (this aborted 29/32 queries in round 3).
  * XOR is order-independent, closed over Long, and still forces every
  * output expression to evaluate per row.
  *
  * Failures are never silently converted into timings: a query that throws
  * is reported as -1 in `queries` and listed in the `errors` array of the
  * JSON line, so a crashing query is visible without reading stack traces.
  */
object Bench {
  private def materialize(df: DataFrame): Long = {
    val row = df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toSeq: _*)))).head
    if (row.isNullAt(0)) 0L else row.getLong(0) // empty result → null fold
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch every table and exercise the shuffle/window/broadcast
    // machinery once, so session-initialization costs don't land on
    // whichever query the map happens to order first — per-query numbers
    // then reflect the query, not its position. (Each query still pays its
    // own codegen, as it would in production.)
    try {
      graft.Tables.all.foreach(t => graft.Tables(spark, sfDir, t).count())
      val r = graft.Tables(spark, sfDir, "region")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("r_regionkey")
        .orderBy("r_name")
      r.join(broadcast(r.select(col("r_regionkey").as("k"), col("r_name").as("n2"))),
          col("r_regionkey") === col("k"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("r_name")).agg(sum(col("rn"))).collect()
    } catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch {
          case e: Throwable =>
            errors += name
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map(e => "\"" + e + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
