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
