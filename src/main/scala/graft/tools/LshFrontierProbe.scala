package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

/** Diagnostic for the LSH frontier's incremental-arrival cost: seeds a
  * `history`-doc store (batch 0 + compact), then runs ONE timed arrival
  * with a stage listener attached and prints every stage over 500 ms —
  * the breakdown the aggregate frontier number can't show.
  * args: history [arrival].
  */
object LshFrontierProbe {
  def main(args: Array[String]): Unit = {
    val history = args.headOption.map(_.toLong).getOrElse(4000000L)
    val arrival = args.lift(1).map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // local-FS deployment tuning: the incremental stores' batch= trees
      // fan 64 bucket dirs per batch, so the default threshold (32)
      // launches a parallel-listing JOB per store read — microseconds of
      // driver listing on a local filesystem, but ~4 scheduled jobs per
      // arrival of pure floor. On object storage keep the default: there
      // the parallel listing is the right plan.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = s"target/tmp/lsh-probe-${System.nanoTime()}"
    val allPath = s"$base/corpus"
    IncrementalDedupBench.corpus(spark, history + arrival)
      .write.mode("overwrite").parquet(allPath)
    val all = spark.read.parquet(allPath)
    val store = s"$base/store"
    println(s"seeding $history ...")
    IncrementalDedup.lshDedupBatch(spark,
      all.filter(col("doc_id") < history), col("doc_id"), col("text"), store, 0L)
    IncrementalDedup.compactStore(spark, store, 0L)

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double, Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val ms = (for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s).getOrElse(0L)
        val read = info.taskMetrics.shuffleReadMetrics.totalBytesRead
        val write = info.taskMetrics.shuffleWriteMetrics.bytesWritten
        stages.add((info.name.takeWhile(_ != '\n'), ms / 1e3, read, write))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    IncrementalDedup.lshDedupBatch(spark,
      all.filter(col("doc_id") >= history), col("doc_id"), col("text"),
      store, 1L).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(listener)
    println(f"ARRIVAL wall=$wall%.1fs; stages over 0.5s:")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.filter(_._2 > 0.5).sortBy(-_._2).foreach {
      case (name, s, r, w) =>
        println(f"  $s%7.2fs read=${r / 1e6}%9.1fMB write=${w / 1e6}%9.1fMB  $name")
    }
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
