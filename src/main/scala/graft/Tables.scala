package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table:
  * `region nation customer supplier part orders lineitem events documents
  * embeddings`. All queries in [[SparkEntry.queries]] take the directory as
  * their second argument, so the same plan runs at any scale factor.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is physically TIMESTAMP(NANOS) parquet. Depending on the
      // Spark build, that column surfaces two different ways; normalize
      // BOTH to the same micro-truncated TimestampType (session tz = UTC)
      // so every downstream query and oracle sees one type and one value:
      //  - builds honoring spark.sql.legacy.parquet.nanosAsLong=true read
      //    raw int64 nanos -> truncate with `ts div 1000`;
      //  - newer builds ignore that conf and read TIMESTAMP_NTZ already
      //    truncated to micros -> cast NTZ to LTZ (UTC session: same
      //    instant, same wall clock DuckDB's TIMESTAMP_NS cast yields).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** [[apply]] plus a repartition-UP guard for compute-bound projections:
    * a small parquet file (a single row group) scans as ONE task no matter
    * what `spark.sql.files.maxPartitionBytes` says, which serializes
    * per-row CPU work on one core — char-fold fingerprints, shingle
    * construction, windowed levenshtein, embedding folds. When the scan is
    * narrower than the cluster, redistribute once up front; at production
    * scale (input splits >= parallelism) this is a no-op, so the guard
    * never adds a shuffle on the 100 TB path. Use [[apply]] for
    * dimensions and join inputs where the scan is not the bottleneck.
    */
  def wide(spark: SparkSession, dir: String, name: String): DataFrame =
    widen(apply(spark, dir, name))

  /** The repartition-up guard behind [[wide]], usable on any DataFrame —
    * the single authority for the "small scan serializes CPU-bound work"
    * mitigation (operators needing it should call this, not re-implement
    * the check).
    */
  def widen(df: DataFrame): DataFrame = {
    val width = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < width) df.repartition(width) else df
  }

  /** Register every table as a temp view (for spark.sql-style access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
