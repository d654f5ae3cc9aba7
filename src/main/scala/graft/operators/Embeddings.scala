package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) — the
  * training-data-pipeline north star's ANN pillar.
  *
  * Two paths, same output contract (probe_id, rk, neighbor_id, cosine):
  *
  *  - [[knnBruteForce]]: exact top-k cosine for a (small) probe set,
  *    broadcast-joined against the full corpus. One pass over the data, no
  *    shuffle except the per-probe top-k window; the right baseline when
  *    |probes| is small — at 100 TB it reads every vector once, which is
  *    unavoidable for exact answers.
  *  - [[annTopK]]: random-hyperplane (SimHash-for-vectors) LSH. Sign-bit
  *    sketches are banded exactly like [[Dedup]]'s MinHash bands, so a
  *    probe only scores candidates sharing at least one band bucket —
  *    sub-linear scored-pair volume at the cost of recall, the standard
  *    100 TB trade. Hyperplanes are seeded literals: identical plan every
  *    run, no runtime RNG.
  *
  * All arithmetic is double-precision (`float` inputs cast up before the
  * multiply), folded sequentially by the higher-order `aggregate` — the
  * DuckDB oracle mirrors the same cast-then-sum shape (its native
  * `list_dot_product` accumulates in float32 and drifts ~1e-8 from the
  * double fold, so the oracle avoids it).
  */
object Embeddings {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0.0 for zero vectors (no NaN poisoning). */
  def cosine(a: Column, b: Column): Column =
    coalesce(dot(a, b) / nullif(norm(a) * norm(b), lit(0.0)), lit(0.0))

  /** Exact top-k cosine neighbors for each probe row.
    *
    * @param corpus  (id, embedding) rows to search
    * @param probes  (id, embedding) rows to search FOR — must be small
    *                enough to broadcast (it is hinted); self-matches are
    *                excluded by id inequality
    */
  def knnBruteForce(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probes.select(probeId.as("probe_id"), probeEmb.as("__pe"))
    val c = corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__ce"))
    val scored = c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("__pe"), col("__ce")), 4).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  // ---------------------------------------------------- hyperplane LSH

  /** Seeded random hyperplanes: `h` unit-free gaussian directions in
    * `dim`-space. Literal arrays in the plan — deterministic.
    */
  def hyperplanes(dim: Int, h: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(h)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit sketch: bit j set iff dot(emb, plane_j) >= 0. Packed into one
    * long (h <= 63).
    */
  def signSketch(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(emb, lit(p)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Band keys of a sign sketch: `bands` keys of `h/bands` bits each,
    * tagged with the band index so buckets never collide across bands.
    */
  def sketchBands(sketch: Column, h: Int, bands: Int): Column = {
    val r = h / bands
    val mask = (1L << r) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sketch, b * r).bitwiseAND(lit(mask)).as("key"))
    }: _*)
  }

  /** Approximate top-k: candidates = corpus rows sharing >= 1 hyperplane
    * band bucket with the probe; exact cosine + top-k window only over
    * those. Recall tunes with (h, bands): more bands / fewer bits per band
    * = more candidates = higher recall.
    *
    * Shuffle discipline: the candidate-generation join carries only
    * (id, band) pairs — never the 64-float embeddings — and the probe side
    * is broadcast twice (it is small by contract). Embeddings are joined
    * back once, only for rows that survived bucketing.
    */
  def annTopK(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5, dim: Int = 64, h: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(dim, h, seed)
    def bandsOf(df: DataFrame, id: Column, emb: Column, idName: String) =
      df.select(id.as(idName),
        explode(sketchBands(signSketch(emb, planes), h, bands)).as("__b"))
    val pBands = bandsOf(probes, probeId, probeEmb, "probe_id")
    val cBands = bandsOf(corpus, corpusId, corpusEmb, "neighbor_id")
    val candIds = cBands.join(broadcast(pBands), Seq("__b"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    val scored = candIds
      .join(corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__ce")), Seq("neighbor_id"))
      .join(broadcast(probes.select(probeId.as("probe_id"), probeEmb.as("__pe"))), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosine(col("__pe"), col("__ce")), 4).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }
}
