package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for structural-counter determinism (BASELINE.md regression
  * rule): run ONE registered query N times in a fresh session, exactly
  * the way Bench measures (listener-drained accumulator deltas
  * bracketing each run), and print per-run jobs / shuffle read / shuffle
  * write / wall. If a counter varies across runs of the same plan on the
  * same data, the variance is intrinsic to the query's runtime behavior
  * (AQE skew splits, runtime broadcast fallbacks) and the gate must read
  * that counter with an allowance — the probe quantifies how much.
  * Found with: q_span_removal's shuffle_read_b moving −32 % between two
  * clean same-code windows while write bytes held within 0.4 %.
  *
  * args: queryName [reps=6] [suite]
  *
  * With the `suite` flag: after the first rep set, execute EVERY
  * registered query once (a bench pass), re-measure the target, then
  * `spark.catalog.clearCache()` and measure once more — separating
  * "intrinsic to the query" from "induced by suite session state" from
  * "cured by cache reset" (the r17 bimodal q_span_removal read: LOW on
  * pass 1 / isolation, HIGH byte-identically on every attempts=2 pass).
  */
object QueryCounterProbe {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val suiteMode = args.lift(2).contains("suite")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val dumpStages = sys.env.contains("SPARK_GRAFT_PROBE_STAGES")
    val perStage =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, Long)]()
    val stages = new java.util.concurrent.atomic.AtomicLong
    val retries = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet()
        if (s.stageInfo.attemptNumber() > 0) retries.incrementAndGet()
        ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          if (dumpStages) perStage.merge(t.stageId,
            (m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
              m.shuffleReadMetrics.recordsRead, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
          ()
        }
      }
    })
    val planDir = sys.env.get("SPARK_GRAFT_PROBE_PLANS")
    def measure(tag: String): Unit = {
      org.apache.spark.graft.BenchTaps.drainListenerBus(spark.sparkContext)
      val (j0, r0, w0) = (jobs.get(), read.get(), write.get())
      val (st0, rt0, tk0) = (stages.get(), retries.get(), tasks.get())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val aggDf = df.agg(
        bit_xor(xxhash64(struct(df.columns.map(col).toSeq: _*))), count(lit(1)))
      val rows = aggDf.head().getLong(1)
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.BenchTaps.drainListenerBus(spark.sparkContext)
      println(f"[probe] $name $tag: ${sec}%.2fs rows=$rows " +
        f"jobs=${jobs.get() - j0} read=${read.get() - r0} write=${write.get() - w0} " +
        f"stages=${stages.get() - st0} retries=${retries.get() - rt0} tasks=${tasks.get() - tk0}")
      if (dumpStages) {
        import scala.jdk.CollectionConverters._
        perStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, (r, w, rr, tk)) =>
          println(s"[probe]   stage $sid: read=$r write=$w recsRead=$rr tasks=$tk")
        }
        perStage.clear()
      }
      // final adaptive executed plan, AFTER materialization — the thing
      // the analyzed-plan hash deliberately does NOT capture; this is
      // where two byte-deterministic modes of the same query diverge
      planDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.$tag.executed.txt"),
          aggDf.queryExecution.executedPlan.toString)
      }
    }
    (1 to reps).foreach(i => measure(s"run$i"))
    if (suiteMode) {
      println(s"[probe] executing full suite (${graft.SparkEntry.queries.size} queries) ...")
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, f) =>
        try {
          val df = f(spark, sfDir)
          df.agg(bit_xor(xxhash64(struct(df.columns.map(col).toSeq: _*)))).head()
          ()
        } catch { case scala.util.control.NonFatal(e) =>
          println(s"[probe] suite query $n failed: ${e.getMessage}")
        }
      }
      (1 to 2).foreach(i => measure(s"postsuite$i"))
      spark.catalog.clearCache()
      (1 to 2).foreach(i => measure(s"postclear$i"))
    }
    spark.stop()
  }
}
