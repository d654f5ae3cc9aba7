package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-discipline utilities for the 100 TB posture (SURVEY §7.4 risk
  * 7): skew-resistant joins and co-located (bucketed) joins.
  *
  * AQE's skew-join handling covers sort-merge joins it can observe; the
  * explicit salt here is for the cases AQE cannot fix (skewed broadcast-
  * ineligible dimension replicated against a hot key, or deterministic
  * plan requirements). Bucketing removes the shuffle from repeated
  * fact-fact joins on the same key — the lake-side equivalent of
  * co-partitioning.
  */
object ScaleOps {

  /** Skew-resistant equi-join: the big (skewed) side gets a random-ish but
    * data-independent salt in [0, n); the small side is replicated n ways
    * with every salt value; the join keys on (key, salt). Semantically
    * identical to `big.join(small, key)` for any 1:N join where `small` is
    * unique on the key (each big row matches exactly the same small rows it
    * would have matched unsalted).
    *
    * The salt derives from `monotonically_increasing_id` — uniform across
    * partitions and rows, no dependence on the (hot) key values, which is
    * the entire point: one hot key spreads over n reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      n: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched REPLICATED small row n
    // times — only joins that preserve at most the big side are sound
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")
      .contains(normalized),
      s"saltedJoin supports inner/left/semi/anti joins only, got '$joinType'")
    val salted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(n.toLong)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted catalog table on `key` — repeated
    * joins/aggregations on `key` between tables bucketed the same way run
    * shuffle-free (bucket-local sort-merge join).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** True iff the executed plan of `df` contains a shuffle exchange
    * (diagnostic for plan tests — broadcast exchanges don't count).
    */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
  }
}
