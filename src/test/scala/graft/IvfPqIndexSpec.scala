package graft

import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, IvfIndex, IvfPqIndex}

/** [[IvfPqIndex]] — IVFADC lifecycle: recall on clustered corpora, the
  * at-rest compression that justifies the residual quantization, probe
  * partition pruning, and append idempotency.
  */
class IvfPqIndexSpec extends SparkSpec {

  private def planted(nClusters: Int, perCluster: Int, dim: Int,
      noise: Double = 0.05): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val n = Array.fill(dim)((rnd.nextGaussian() * noise).toFloat)
      ((c * perCluster + i).toLong, centers(c).zip(n).map { case (a, b) => a + b })
    }
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("ivfpq").toString

  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    val s = java.nio.file.Files.walk(root)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  test("probe keeps neighbors inside their planted cluster and recalls the exact set") {
    import spark.implicits._
    val vecs = planted(nClusters = 8, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 4 === 0)
    val path = tmpDir()
    IvfPqIndex.build(df, $"vec_id", $"embedding", path,
      nlist = 8, replicas = 2, refineIterations = 1, m = 8, ks = 16, pqRefine = 1)
    val got = IvfPqIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val crossCluster = got.count { case (p, n) => p / 8 != n / 8 }
    assert(crossCluster == 0,
      s"$crossCluster of ${got.length} IVFPQ neighbors crossed a planted cluster boundary")
    // recall@5 vs exact — residual quantization on a clustered corpus
    // must preserve most of the true neighbor set, not just the cluster
    val exact = Embeddings.knnBruteForce(
        df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    val byProbe = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = got.count { case (p, n) => byProbe.getOrElse(p, Set.empty)(n) }
    val recall = hits.toDouble / exact.length
    info(f"IVFPQ recall@5 on planted clusters: $recall%.3f")
    assert(recall >= 0.5, s"IVFPQ recall@5 $recall < 0.5")
  }

  test("probeRescored recovers exact rank order that raw ADC cannot") {
    import spark.implicits._
    // tight clusters of 12 with k=5: raw PQ keeps neighbors in-cluster
    // but ranks near-ties ~randomly; the float rescore of the shortlist
    // must match the exact top-5 almost everywhere
    val vecs = planted(nClusters = 6, perCluster = 12, dim = 64, noise = 0.02)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 6 === 0)
    val path = tmpDir()
    IvfPqIndex.build(df, $"vec_id", $"embedding", path,
      nlist = 6, replicas = 2, m = 8, ks = 16)
    val exact = Embeddings.knnBruteForce(
        df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rescored = IvfPqIndex.probeRescored(
        spark, path, df, $"vec_id", $"embedding",
        probes, $"vec_id", $"embedding", k = 5, nprobe = 3, shortlist = 11)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rankRecall = (exact intersect rescored).size.toDouble / exact.size
    info(f"rescored rank-recall@5 (exact (probe, rk, neighbor) triples): $rankRecall%.3f")
    assert(rankRecall >= 0.95,
      s"rescored rank-recall $rankRecall < 0.95 — the float rescore should " +
        "recover exact order whenever the true neighbor is in the shortlist")
    // and raw ADC on the same corpus does NOT achieve this rank fidelity
    val raw = IvfPqIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    val rawRankRecall = (exact intersect raw).size.toDouble / exact.size
    info(f"raw ADC rank-recall@5: $rawRankRecall%.3f")
    assert(rawRankRecall < rankRecall,
      "rescore did not improve rank fidelity — shortlist or rescore is wired wrong")
  }

  test("PQ cells store at least 4x smaller than the flat IVF cells") {
    import spark.implicits._
    val vecs = planted(nClusters = 20, perCluster = 400, dim = 64)
    val df = vecs.toDF("vec_id", "embedding").repartition(4)
    val flatPath = tmpDir()
    val pqPath = tmpDir()
    IvfIndex.build(df, $"vec_id", $"embedding", flatPath,
      nlist = 20, replicas = 1, refineIterations = 0)
    IvfPqIndex.build(df, $"vec_id", $"embedding", pqPath,
      nlist = 20, replicas = 1, refineIterations = 0, m = 8, ks = 16, pqRefine = 0)
    val flatBytes = dirBytes(s"$flatPath/cells")
    val pqBytes = dirBytes(s"$pqPath/cells")
    info(f"cells at rest: flat $flatBytes%d B, pq $pqBytes%d B " +
      f"(${flatBytes.toDouble / pqBytes}%.1fx)")
    assert(pqBytes * 4 < flatBytes,
      s"expected >= 4x compression, got flat=$flatBytes pq=$pqBytes")
  }

  test("append lands encoded rows against stored codebooks; replay is idempotent") {
    import spark.implicits._
    val vecs = planted(nClusters = 6, perCluster = 8, dim = 64)
    val (first, second) = vecs.partition(_._1 < 24)
    val path = tmpDir()
    IvfPqIndex.build(first.toDF("vec_id", "embedding"), $"vec_id", $"embedding",
      path, nlist = 6, replicas = 2, m = 8, ks = 16)
    IvfPqIndex.append(spark, second.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    val probes = vecs.filter(_._1 % 8 == 0).toDF("vec_id", "embedding")
    def run() = IvfPqIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val got = run()
    for (p <- Seq(24L, 32L, 40L)) {
      val nbrs = got.filter(_._1 == p).map(_._3)
      assert(nbrs.subsetOf((p until p + 8).toSet - p),
        s"probe $p pulled cross-cluster neighbors: $nbrs")
      assert(nbrs.size == 5)
    }
    IvfPqIndex.append(spark, second.toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    assert(run() == got)
  }

  test("compact consolidates batch history without changing probe results") {
    import spark.implicits._
    val vecs = planted(nClusters = 6, perCluster = 8, dim = 64)
    val parts = vecs.grouped(16).toSeq
    val path = tmpDir()
    IvfPqIndex.build(parts(0).toDF("vec_id", "embedding"), $"vec_id", $"embedding",
      path, nlist = 6, replicas = 2)
    IvfPqIndex.append(spark, parts(1).toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 1L)
    IvfPqIndex.append(spark, parts(2).toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 2L)
    val probes = vecs.filter(_._1 % 8 == 0).toDF("vec_id", "embedding")
    def run() = IvfPqIndex.probe(spark, path, probes, $"vec_id", $"embedding",
        k = 5, nprobe = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val before = run()
    IvfPqIndex.compact(spark, path, upToBatch = 1L)
    val batchDirs = new java.io.File(s"$path/cells").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    // 0 and 1 consolidated under 1 (largest existing <= upToBatch); 2 kept
    assert(batchDirs == Seq("batch=1", "batch=2"), s"got $batchDirs")
    assert(run() == before, "probe results changed across compaction")
    // appends continue with fresh ids after compaction
    IvfPqIndex.append(spark,
      Seq((9990L, vecs.head._2)).toDF("vec_id", "embedding"),
      $"vec_id", $"embedding", path, batchId = 3L)
    assert(run().nonEmpty)
    // full compaction folds everything into the largest id
    IvfPqIndex.compact(spark, path, upToBatch = Long.MaxValue)
    val after = new java.io.File(s"$path/cells").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(after == Seq("batch=3"), s"got $after")
  }

  test("append file fan is bounded by the bucket count, not cells x tasks") {
    import spark.implicits._
    // 64 cells, rows spread over every executor partition: the pre-r15
    // cell-dir layout landed up to one file per (touched cell x write
    // task) per append — the r14 capstone's dominant small-files
    // producer (~1,350 files/batch). The bucketed layout bounds an
    // append at one file per touched cbk= dir.
    val vecs = planted(nClusters = 64, perCluster = 8, dim = 64)
    val (first, second) = vecs.partition(_._1 % 2 == 0)
    val path = tmpDir()
    IvfPqIndex.build(
      first.toDF("vec_id", "embedding").repartition(32),
      $"vec_id", $"embedding", path, nlist = 64, replicas = 1, m = 8, ks = 16)
    IvfPqIndex.append(spark,
      second.toDF("vec_id", "embedding").repartition(32),
      $"vec_id", $"embedding", path, batchId = 1L)
    val batchDir = java.nio.file.Paths.get(s"$path/cells/batch=1")
    val s = java.nio.file.Files.walk(batchDir)
    val dataFiles =
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .map[String](_.getFileName.toString)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
        .count()
      finally s.close()
    // 64 planted cells spread over 32 input tasks would be up to ~2048
    // files in the cell-dir layout; the bucket fan caps it at 64
    assert(dataFiles <= 64, s"append landed $dataFiles files, wanted <= 64")
    val dirs = new java.io.File(s"$path/cells/batch=1").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cbk=")),
      s"expected bucketed cbk= dirs, got ${dirs.take(5).mkString(",")}")
  }

  test("probe scans only the probed cells' partitions") {
    import spark.implicits._
    val vecs = planted(nClusters = 8, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val path = tmpDir()
    IvfPqIndex.build(df, $"vec_id", $"embedding", path, nlist = 8, replicas = 1)
    val oneProbe = df.filter($"vec_id" === 0)
    val plan = IvfPqIndex.probe(spark, path, oneProbe, $"vec_id", $"embedding",
      k = 3, nprobe = 2)
    plan.collect()
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
    assert(scanned <= 2, s"probe read $scanned cell partitions, wanted <= 2")
  }
}
