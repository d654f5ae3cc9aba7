package graft

import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, IvfIndex}

/** [[IvfIndex]] — the persistent build/append/probe lifecycle must match
  * the in-query [[Embeddings.ivfTopK]] result for the same geometry, and
  * probing must scan only the probed cells' partitions.
  */
class IvfIndexSpec extends SparkSpec {

  private def planted(nClusters: Int, perCluster: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val noise = Array.fill(dim)((rnd.nextGaussian() * 0.05).toFloat)
      ((c * perCluster + i).toLong,
        centers(c).zip(noise).map { case (a, b) => a + b })
    }
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("ivfidx").toString

  test("stored-index probe equals in-query ivfTopK for the same geometry") {
    import spark.implicits._
    val vecs = planted(nClusters = 6, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 8 === 0)
    val path = tmpDir()
    IvfIndex.build(df, $"vec_id", $"embedding", path,
      nlist = 8, replicas = 2, refineIterations = 1)
    val fromStore = IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val inQuery = Embeddings.ivfTopK(
        df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding",
        k = 5, nlist = 8, nprobe = 3, replicas = 2, refineIterations = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(fromStore == inQuery)
  }

  test("append lands new rows without re-indexing; replay is idempotent") {
    import spark.implicits._
    val vecs = planted(nClusters = 6, perCluster = 8, dim = 64)
    val (first, second) = vecs.partition(_._1 < 24)
    val path = tmpDir()
    IvfIndex.build(first.toDF("vec_id", "embedding"), $"vec_id", $"embedding",
      path, nlist = 8, replicas = 2)
    IvfIndex.append(spark, second.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    val probes = vecs.filter(_._1 % 8 == 0).toDF("vec_id", "embedding")
    def run() = IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val got = run()
    // members of appended clusters are retrievable: every probe from the
    // second half must find its own tight cluster-mates
    for (p <- Seq(24L, 32L, 40L)) {
      val nbrs = got.filter(_._1 == p).map(_._3)
      assert(nbrs.subsetOf((p until p + 8).toSet - p),
        s"probe $p pulled cross-cluster neighbors: $nbrs")
      assert(nbrs.size == 5)
    }
    // replaying the same batch overwrites its own partition: no dup rows
    IvfIndex.append(spark, second.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    assert(run() == got)
  }

  test("probe scans only the probed cells' partitions") {
    import spark.implicits._
    val vecs = planted(nClusters = 8, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val path = tmpDir()
    IvfIndex.build(df, $"vec_id", $"embedding", path, nlist = 8, replicas = 1)
    val oneProbe = df.filter($"vec_id" === 0)
    val plan = IvfIndex.probe(spark, path, oneProbe, $"vec_id", $"embedding",
      k = 3, nprobe = 2)
    plan.collect()
    // unwrap AQE wrappers: collect() does not descend into an adaptive
    // plan's materialized stages
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val scans = allNodes(plan.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    assert(scans.nonEmpty, "no file scan over the cells store found")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    // 8 cells exist; nprobe=2 must prune to at most 2 partitions
    assert(scanned <= 2, s"probe read $scanned cell partitions, wanted <= 2")
  }

  test("legacy cell= layout fails fast on probe/append and migrate heals a mixed tree") {
    import spark.implicits._
    val vecs = planted(nClusters = 6, perCluster = 8, dim = 64)
    val (first, second) = vecs.partition(_._1 < 24)
    val path = tmpDir()
    IvfIndex.build(first.toDF("vec_id", "embedding"), $"vec_id", $"embedding",
      path, nlist = 8, replicas = 2)
    IvfIndex.append(spark, second.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    val probes = vecs.filter(_._1 % 8 == 0).toDF("vec_id", "embedding")
    def run() = IvfIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val expected = run()
    // rewrite batch=0 in the pre-bucketing legacy layout (cell= dirs,
    // no cbk) while batch=1 stays bucketed — a mixed tree, the exact
    // state a crashed post-upgrade append would leave on a legacy index
    val legacyRows = spark.read.parquet(s"$path/cells/batch=0")
      .drop("cbk").collect()
    val schema = spark.read.parquet(s"$path/cells/batch=0").drop("cbk").schema
    val b0 = new org.apache.hadoop.fs.Path(s"$path/cells/batch=0")
    val fs = b0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(b0, true)
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacyRows.toIndexedSeq, 2), schema)
      .write.partitionBy("cell").parquet(b0.toString)
    // every entry point fails FAST with the named cause
    val eProbe = intercept[IllegalStateException](run())
    assert(eProbe.getMessage.contains("legacy cell= partition layout"))
    val eAppend = intercept[IllegalStateException](
      IvfIndex.append(spark, second.toDF("vec_id", "embedding"),
        $"vec_id", $"embedding", path, batchId = 2L))
    assert(eAppend.getMessage.contains("legacy cell= partition layout"))
    val eCompact = intercept[IllegalStateException](
      IvfIndex.compact(spark, path, upToBatch = 1L))
    assert(eCompact.getMessage.contains("legacy cell= partition layout"))
    // migrate rewrites both batches bucketed; probe results are unchanged
    IvfIndex.migrate(spark, path)
    assert(run() == expected)
    // and the migrated tree is pure cbk= layout (idempotent: second
    // migrate is a no-op)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/cells/batch=0"))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cbk=")), dirs.toSeq)
    IvfIndex.migrate(spark, path)
    assert(run() == expected)
  }
}
