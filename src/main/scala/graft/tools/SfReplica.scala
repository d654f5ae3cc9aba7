package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up of a test-data directory for SF-SCALING evidence
  * (r18, VERDICT r17 item 4): writes `<out>/<table>.parquet` where the
  * row-heavy tables (`lineitem`, `orders`, `documents`) are `k`
  * key-shifted copies of the source and every other table copies
  * through unchanged. Key shifting keeps id-derived semantics sane
  * (doc_id % benchMod slices, distinct doc counts, per-key hashing)
  * while the VALUE distributions replicate exactly — so per-operator
  * cost scales with data volume the way a larger real SF would, without
  * inventing a new generator. This is measurement tooling only: nothing
  * in the query path reads its output unless `SPARK_GRAFT_SF_DIR`
  * points at it.
  *
  * Run: sbt "runMain graft.tools.SfReplica <srcDir> <outDir> <k>"
  */
object SfReplica {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: SfReplica <srcDir> <outDir> <k>")
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame, idCols: Seq[String]): DataFrame = {
      val maxes = idCols.map(c =>
        c -> (df.agg(max(col(c))).head().getLong(0) + 1L)).toMap
      (0 until k).map { i =>
        idCols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, col(c) + lit(i * maxes(c)))
        }
      }.reduce(_ unionAll _)
    }

    graft.Tables.all.foreach { t =>
      // raw parquet read/write (events' nanos column round-trips as-is;
      // the normalizing reader in Tables.apply is for QUERY consumers)
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled = t match {
        case "documents" => replicate(df, Seq("doc_id"))
        case "lineitem" => replicate(df, Seq("l_orderkey"))
        case "orders" => replicate(df, Seq("o_orderkey"))
        case _ => df
      }
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      println(s"[sfreplica] $t: ${df.count()} -> ${scaled.count()} rows")
    }
    spark.stop()
  }
}
