package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {

  /** Deterministic planted clusters: `nClusters` orthogonal-ish centers,
    * `perCluster` members each = center + small deterministic noise.
    */
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

  test("dot / norm / cosine basics") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),   // cos 1
      (Array(1f, 0f), Array(0f, 1f)),   // cos 0
      (Array(1f, 1f), Array(1f, 0f)),   // cos 1/sqrt(2)
      (Array(0f, 0f), Array(1f, 0f)))   // zero vector -> 0.0, not NaN
      .toDF("a", "b")
    val got = df.select(round(Embeddings.cosine(col("a"), col("b")), 4)).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0, 0.7071, 0.0))
  }

  test("ANN top-k equals brute-force top-k on planted clusters") {
    import spark.implicits._
    val vecs = planted(nClusters = 5, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 8 === 0) // first member of each cluster
    val exact = Embeddings.knnBruteForce(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    val ann = Embeddings.annTopK(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding",
      k = 5, dim = 64, h = 16, bands = 4)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    // within a tight planted cluster, hyperplane banding must recover the
    // exact neighbor set (cluster members share almost all sign bits)
    assert(ann == exact)
    // and each probe's exact top-5 comes entirely from its own cluster
    for (p <- Seq(0L, 8L, 16L, 24L, 32L)) {
      val nbrs = exact.filter(_._1 == p).map(_._3)
      assert(nbrs.size == 5 && nbrs.subsetOf((p until p + 8).toSet - p))
    }
  }

  test("cosine near-duplicate pairs match brute force on planted near-dups") {
    import spark.implicits._
    // clusters with 0.05-sigma noise around unit-scale centers: members of
    // one cluster are tight near-dups, cross-cluster cosines are far lower
    val vecs = planted(nClusters = 4, perCluster = 5, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val expect = (for {
      (ia, ea) <- vecs; (ib, eb) <- vecs if ia < ib
      c = BigDecimal(cos(ea, eb)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      if c >= 0.95
    } yield (ia, ib)).toSet
    assert(expect.nonEmpty) // the planted clusters actually contain pairs
    val got = Embeddings.cosineNearDuplicates(df, $"vec_id", $"embedding", threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == expect)
    // and every found pair is within one planted cluster
    got.foreach { case (a, b) => assert(a / 5 == b / 5) }
  }

  test("IVF top-k equals brute force on planted clusters and prunes candidates") {
    import spark.implicits._
    val vecs = planted(nClusters = 5, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 8 === 0)
    val exact = Embeddings.knnBruteForce(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    // tight clusters assign WHOLE to one cell (near-identical vectors share
    // the argmin centroid, sampled or not), and the probe — also a member —
    // probes that cell first: IVF must recover the exact neighbor set
    val ivf = Embeddings.ivfTopK(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding",
      k = 5, nlist = 8, nprobe = 3)
      .select($"probe_id", $"rk", $"neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("IVF recall@5 on the real sf0.01 embeddings table (cell-count gate)") {
    import spark.implicits._
    val df = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val probes = df.filter($"vec_id" % 50 === 0)
    val exact = Embeddings.knnBruteForce(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    val exactBy = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Embeddings.ivfTopK(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding",
      k = 5, nlist = 16, nprobe = 4)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    val ivfBy = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = exactBy.map { case (p, ex) =>
      ivfBy.getOrElse(p, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val recall = rs.sum / rs.size
    // near-random vectors are the IVF worst case too (neighbors at wide
    // angles scatter across cells); nprobe/nlist = 1/4 of the corpus
    // scored buys the measured recall below
    assert(recall >= 0.5, s"IVF recall@5 $recall < 0.5 at nlist=16 nprobe=4")
  }

  test("ANN recall@5 on the real sf0.01 embeddings table (geometry gate)") {
    import spark.implicits._
    // The synthetic table is a WORST case for hyperplane LSH: embeddings
    // are near-random (max pairwise cosine ~0.6), so top-5 "neighbors" sit
    // at wide angles and share few sign bits. Real embedding corpora have
    // far tighter neighbors (the planted-cluster test above shows recall
    // 1.0 there). This gate pins the measured floor for two geometries so
    // the (h, bands) knob can't silently regress:
    //   h=16 bands=4  (the q_embedding_ann default): ~22% of all-pairs
    //                 scored, measured mean recall 0.56
    //   h=32 bands=8  (high-recall): ~40% scored, measured recall 0.80
    val df = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val probes = df.filter($"vec_id" % 50 === 0)
    val exact = Embeddings.knnBruteForce(
      df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding", k = 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    val exactBy = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(h: Int, bands: Int): Double = {
      val ann = Embeddings.annTopK(
        df, $"vec_id", $"embedding", probes, $"vec_id", $"embedding",
        k = 5, dim = 64, h = h, bands = bands)
        .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
      val annBy = ann.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exactBy.map { case (p, ex) =>
        annBy.getOrElse(p, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }
    val rDefault = meanRecall(16, 4)
    val rHigh = meanRecall(32, 8)
    assert(rDefault >= 0.5, s"default geometry h=16 bands=4: recall@5 $rDefault < 0.5")
    assert(rHigh >= 0.7, s"high-recall geometry h=32 bands=8: recall@5 $rHigh < 0.7")
    assert(rHigh > rDefault, s"more bands must buy recall ($rHigh vs $rDefault)")
  }

  test("width-mismatched embeddings fail loudly instead of collapsing to sketch 0") {
    import spark.implicits._
    // 32-wide vectors vs 64-wide hyperplanes: zip_with pads with nulls, the
    // dot goes null — must throw, not bucket every row together
    val df = Seq((1L, Array.fill(32)(1f)), (2L, Array.fill(32)(2f))).toDF("vec_id", "embedding")
    val planes = Embeddings.hyperplanes(64, 16, 42L)
    val ex = intercept[Exception] {
      df.select(Embeddings.signSketch($"embedding", planes)).collect()
    }
    assert(ex.getMessage.contains("signSketch") ||
      Option(ex.getCause).exists(_.getMessage.contains("signSketch")))
  }

  test("ANN scores strictly fewer pairs than brute force (bucketing prunes)") {
    import spark.implicits._
    val vecs = planted(nClusters = 5, perCluster = 8, dim = 64)
    val df = vecs.toDF("vec_id", "embedding")
    val probes = df.filter($"vec_id" % 8 === 0)
    val planes = Embeddings.hyperplanes(64, 16, 42L)
    val withB = df.select($"vec_id",
      explode(Embeddings.sketchBands(Embeddings.signSketch($"embedding", planes), 16, 4)).as("b"))
    val cand = withB.as("c").join(withB.as("p"), $"c.b" === $"p.b")
      .filter($"c.vec_id" =!= $"p.vec_id").select($"c.vec_id", $"p.vec_id").distinct().count()
    assert(cand < 40L * 39L) // strictly fewer than all-pairs
  }
}
