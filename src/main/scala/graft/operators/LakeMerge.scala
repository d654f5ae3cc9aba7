package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D3/S5: the idempotent keyed merge write — the reference's Mongo
  * `UpdateOne({_id}, {$set: doc}, upsert=True)` bulk
  * (src/resilient_scraper.py:941-974) re-expressed as
  * last-write-wins-per-key over a date-partitioned Parquet lake with
  * dynamic partition overwrite (SURVEY §4 "the one place our engine writes
  * nontrivial plan logic").
  *
  * Scale shape: only the partitions DATED by the incoming batch are read,
  * merged, and rewritten — the rest of the lake is untouched (the
  * reference's collection-per-day routing, utils.py:567-592, becomes
  * partition pruning). Within those partitions the merge is one shuffle on
  * `_id`. Re-running the same batch is a no-op by construction (same keys,
  * same winner).
  */
object LakeMerge {

  val PartitionCol = "event_date"

  /** Merge `incoming` canonical docs into the lake at `path`, partitioned
    * by event_date = to_date(metadata.created_at). Incoming beats existing
    * on key collision (the `$set` upsert contract); among duplicates within
    * one side, newest `scraped_at` wins with `_id` as final tiebreak.
    */
  def mergeWrite(spark: SparkSession, incoming: DataFrame, path: String): Unit = {
    // Checkpoint the batch as well: reprocess/backfill batches are
    // themselves derived FROM the lake, and Spark (rightly) refuses to
    // overwrite a path still referenced by the writing plan. A batch is
    // bounded (one scrape/repair slice), so materializing it is cheap
    // relative to the merge shuffle.
    val inc = incoming.withColumn(PartitionCol, to_date(col("metadata.created_at")))
      .localCheckpoint()

    val merged =
      if (!lakeExists(spark, path)) inc.withColumn("__pri", lit(1))
      else {
        // Only the touched partitions participate in the merge. The date
        // list is partition METADATA (bounded by the batch's date range),
        // not data — collecting it to the driver mirrors the reference's
        // per-day routing loop and enables partition pruning on the read.
        val dates = inc.select(col(PartitionCol)).distinct().collect().map(_.getDate(0))
        // null event_date (null created_at upstream of nest's fallback)
        // routes to the default partition — isin(null) would evaluate to
        // null and silently EXCLUDE existing null-partition rows from the
        // merge, losing them on the overwrite
        val (nullDates, realDates) = dates.partition(_ == null)
        val datePred = {
          val in = col(PartitionCol).isin(realDates.toSeq: _*)
          if (nullDates.nonEmpty) in || col(PartitionCol).isNull else in
        }
        val existing = spark.read.parquet(path)
          .filter(datePred)
          // Truncate lineage: Spark refuses to overwrite a path that an
          // active plan still reads from; the checkpoint materializes the
          // (pruned, small) affected slice before the write.
          .localCheckpoint()
        existing.withColumn("__pri", lit(0))
          .unionByName(inc.withColumn("__pri", lit(1)))
      }

    // final tiebreak: a content hash — two docs sharing (_id, priority,
    // scraped_at) would otherwise be picked by task-scheduling order,
    // breaking the "same batch, same winner" idempotency contract
    val w = Window.partitionBy(col("_id"))
      .orderBy(col("__pri").desc, col("metadata.scraped_at").desc_nulls_last,
        xxhash64(struct(col("content"), col("metadata"), col("metrics"))))
    val winners = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try winners.write.mode("overwrite").partitionBy(PartitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  def readLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def lakeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
