package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization shared by the iterative operators
  * ([[LakeMerge]]'s merge inputs, [[Dedup.connectedComponents]]'s label
  * frames): `localCheckpoint` by default, a RELIABLE `checkpoint` when
  * the session opts in — localCheckpoint stores blocks on executors,
  * fine in local mode, but on a real cluster an executor lost
  * mid-computation takes its blocks with it and fails the job, since
  * after lineage truncation there is nothing to recompute from.
  * Cluster deployments set [[ReliableCheckpointConf]] (and
  * `SparkContext.setCheckpointDir` on durable storage).
  */
object Checkpoints {

  val ReliableCheckpointConf = "spark.graft.reliableCheckpoint"

  /** Truncate `df`'s lineage. `legacyConfKeys` lets call sites honor
    * their historical opt-in keys (LakeMerge shipped
    * `spark.graft.lake.reliableCheckpoint` before this helper existed).
    */
  /** Public alias of [[materialize]] for query-layer callers that fan a
    * frame into several downstream actions.
    */
  def materializeFrame(df: DataFrame): DataFrame = materialize(df)

  private[operators] def materialize(df: DataFrame, legacyConfKeys: String*): DataFrame = {
    val spark = df.sparkSession
    val reliable = (ReliableCheckpointConf +: legacyConfKeys)
      .exists(k => spark.conf.getOption(k).contains("true"))
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** Free the executor blocks behind a frame [[materialize]] produced
    * with localCheckpoint, once a newer frame supersedes it — without
    * this an iterative loop holds one full copy per iteration until GC
    * happens to run the ContextCleaner. `Dataset.unpersist` only talks
    * to the cache manager, so this reaches through the LogicalRDD;
    * reliable checkpoints (files) are untouched (unpersist on an
    * unpersisted RDD is a no-op).
    */
  private[operators] def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
