package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Embeddings

/** Similarity-search queries over the `embeddings` table (vec_id,
  * embedding FLOAT[64], label).
  *
  * The registered workload is the all-pairs 5-NN GRAPH of the corpus
  * (every row is a probe) — the regime similarity indexes exist for. A
  * handful-of-probes workload can never justify an index: building any
  * sketch/cell structure costs more corpus passes than just scoring the
  * probes exactly, so benchmarking knn-vs-ann there only measures fixed
  * stage overhead. The neighbor-graph shape (dedup graphs, diversity
  * sampling, graph-based ANN index construction) is where the exact path
  * goes quadratic and the index earns its keep — and it is fully
  * deterministic, so the driver's hash compare stays stable.
  */
object EmbeddingQueries {

  private val K = 5

  /** Exact cosine 5-NN graph — brute-force baseline
    * ([[Embeddings.knnBruteForce]] with probes = corpus): one corpus scan
    * against a broadcast of all (id, embedding, norm) rows. Inherently
    * n²·dim work — the quadratic wall that motivates [[embeddingAnn]];
    * at 100 TB this exact variant is only feasible per-partition (e.g.
    * per-day slices small enough to broadcast).
    */
  def embeddingKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.knnBruteForce(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K)
      .orderBy($"probe_id", $"rk")
  }

  // Double-cast element-wise products summed by list_sum, mirroring the
  // Spark side's double fold — DuckDB's native list_dot_product accumulates
  // in float32 and drifts ~1e-8, which the shared round(_, 4) cannot hide
  // near rounding boundaries.
  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a)+1)])"

  /** The ONE 5-NN-graph SQL skeleton (scored CTE + per-probe rank),
    * shared by the float, int8, and ANN oracles over a prepared
    * `src(vec_id, <vec>)` CTE — a change to the tie-break, rounding, or
    * self-match rule lands in all or none. `probeExtra` carries extra
    * src columns into the probe alias (", s0 AS p0"); `extraPred` is
    * ANDed into the candidate predicate (the ANN hamming ball).
    */
  private def knnGraphSql(srcCte: String, vec: String,
      probeExtra: String = "", extraPred: String = "",
      probeVec: String = "", dotPcOverride: String = ""): String = {
    val pv = if (probeVec.nonEmpty) probeVec else vec
    val dotPC =
      if (dotPcOverride.nonEmpty) dotPcOverride else dotSql("p.pe", s"e.$vec")
    val normP = s"sqrt(${dotSql("p.pe", "p.pe")})"
    val normC = s"sqrt(${dotSql(s"e.$vec", s"e.$vec")})"
    s"""$srcCte,
       |probes AS (SELECT vec_id AS probe_id, $pv AS pe$probeExtra FROM src),
       |scored AS (
       |  SELECT p.probe_id, e.vec_id AS neighbor_id,
       |    round(coalesce($dotPC / nullif($normP * $normC, 0.0), 0.0), 4) AS cosine
       |  FROM src e CROSS JOIN probes p
       |  WHERE e.vec_id <> p.probe_id$extraPred)
       |SELECT probe_id, rk, neighbor_id, cosine FROM (
       |  SELECT probe_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rk
       |  FROM scored)
       |WHERE rk <= $K ORDER BY probe_id, rk""".stripMargin
  }

  /** One packed sketch word ([[Embeddings.sparsePlanes]] bits lo until
    * hi) as exact SQL: each plane's sum replays
    * [[graft.functions.VectorOps.sparseSketch]]'s fold bit-for-bit —
    * left-associated `0.0 ± CAST(e[i] AS DOUBLE) …` in plane order (the
    * ±1 signs become + / −, exact in IEEE), sign rule `>= 0`, bit
    * (j−lo) of the word. Terms sum in HUGEINT (bit 63's constant is
    * Long.MinValue) and the word casts back to BIGINT — the same two's
    * complement value Spark's long carries.
    */
  private def annSketchWordSql(e: String,
      idx: Seq[Seq[Int]], sgn: Seq[Seq[Double]], lo: Int, hi: Int): String = {
    val terms = (lo until hi).map { j =>
      val sum = idx(j).zip(sgn(j)).map { case (i, s) =>
        (if (s >= 0) "+" else "-") + s" CAST($e[${i + 1}] AS DOUBLE)"
      }.mkString("0.0 ", " ", "")
      s"CASE WHEN ($sum) >= 0 THEN CAST(${1L << (j - lo)} AS HUGEINT) ELSE 0 END"
    }
    s"CAST((${terms.mkString(" + ")}) AS BIGINT)"
  }

  val embeddingKnnSql: String =
    knnGraphSql("WITH src AS (SELECT vec_id, embedding FROM embeddings)", "embedding")

  /** Sketch-rank approximate top-5 ([[Embeddings.annTopK]]) — the 100 TB
    * scale path: 96-bit sparse-sign fingerprints, hamming-ball candidate
    * selection, exact rescore of survivors only. Registered at the
    * library defaults ([[Embeddings.AnnH]]/[[Embeddings.AnnSparsity]]/
    * [[Embeddings.AnnHammingMax]]), the SAME geometry EmbeddingsSpec
    * gates at recall@5 >= 0.8 against [[embeddingKnn]] on this table.
    * FULLY oracle-gated: approximate w.r.t. the true top-k, but
    * deterministic in (planes, embeddings) — and every step is exact
    * arithmetic an external engine reproduces bit-for-bit. The DuckDB
    * oracle re-derives the 96 sparse-sign plane sums from the SAME
    * seeded [[Embeddings.sparsePlanes]] constants (left-associated IEEE
    * fold, `>= 0` sign rule — see [[annSketchWordSql]]), packs them into
    * the same two sketch words, applies the identical
    * `bit_count(xor) <= hammingMax` ball, and rescores survivors through
    * the shared knn skeleton (rounded-cosine rank, neighbor_id
    * tie-break). So the INDEX MECHANISM — sketching, packing, ranking,
    * ball pruning — is cross-engine verified, not just the final
    * cosines; the recall property stays spec-gated.
    */
  def embeddingAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.annTopK(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K)
      .orderBy($"probe_id", $"rk")
  }

  /** IVF cell-probing approximate top-5 ([[Embeddings.ivfTopK]]) — the
    * cell-partitioned alternative to [[embeddingAnn]]'s fingerprint
    * ranking. nlist is NOT pinned: the operator derives ⌈√n⌉ cells from
    * the corpus (23 at sf0.01, 71 at sf0.1), so per-probe candidate
    * volume stays ~nprobe·replicas·√n instead of a constant corpus
    * fraction. The registered geometry nprobe=12 × replicas=2 is
    * spec-gated at recall@5 >= 0.8 vs exact on the real sf0.1 table
    * (measured 0.847 scanning ~34 % of this worst-case near-random
    * corpus; the fraction keeps falling as n grows and real clustered
    * corpora need far less — see the operator's measured ladder).
    * Deterministic (seeded sample + one Lloyd pass) but the centroid
    * sample hinges on xxhash64, which no external SQL engine reproduces —
    * registered rows-only; EmbeddingsSpec pins planted-cluster exactness
    * and that the candidate fraction falls as n grows.
    */
  def embeddingIvf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.ivfTopK(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K, nprobe = 12, replicas = 2)
      .orderBy($"probe_id", $"rk")
  }

  /** The ORACLE-GATED flat IVF variant: identical cell machinery to
    * [[embeddingIvf]] — ⌈√n⌉ cells, nprobe=12, replicas=2 — but
    * refineIterations=0 (centroids are the normalized md5-ordered
    * sample, no Lloyd pass) and a portable sample hash, which makes the
    * ENTIRE index deterministic EXACT arithmetic: the DuckDB oracle
    * re-derives nlist from the corpus count, selects the same sample
    * rows (md5 hex ordering — the q_stratified_sample portability
    * precedent), normalizes them with the same left-associated
    * sum-of-squares fold, replays the assignment argmin bit-for-bit
    * (explicit left-associated dot expansions — no list_sum, whose fold
    * order is not contractual), applies the same replicas/nprobe ranks
    * with the same (negDot, cell) tie rule, and scores candidates
    * through the shared knn skeleton via an EXISTS over the two
    * assignment tables. Cell selection, multi-assignment, probing, and
    * rescoring — the IVF mechanism itself — are cross-engine verified;
    * the Lloyd-refined production variant stays rows-only (its
    * distributed averages carry run-order float noise by nature) with
    * its recall spec-gates.
    */
  def embeddingIvfFlat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.ivfTopK(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K, nprobe = 12, replicas = 2, refineIterations = 0,
      portableSample = true)
      .orderBy($"probe_id", $"rk")
  }

  /** Explicit left-associated expansions replaying the engine's exact
    * fold order ([[graft.functions.VectorOps]] / Scala `Seq#sum`):
    * `0.0 + t1 + t2 + …`. Used where UNROUNDED doubles feed a
    * comparison (the assignment argmin); the final cosine stays on
    * [[dotSql]] + round(_, 4), which is fold-order tolerant.
    */
  private def sumSqExplicitSql(arr: String, dim: Int): String =
    (0 until dim).map(i =>
      s"CAST($arr[${i + 1}] AS DOUBLE) * CAST($arr[${i + 1}] AS DOUBLE)")
      .mkString("0.0 + ", " + ", "")

  private def dotCentroidExplicitSql(e: String, c: String, dim: Int): String =
    (0 until dim).map(i => s"CAST($e[${i + 1}] AS DOUBLE) * $c[${i + 1}]")
      .mkString("0.0 + ", " + ", "")

  /** Generated from the registered (nprobe=12, replicas=2, dim=64)
    * parameters; nlist is derived from the data inside the SQL exactly
    * as [[Embeddings.deriveNlist]] does.
    */
  private[queries] def embeddingIvfFlatSql(
      dim: Int, nprobe: Int, replicas: Int): String = {
    val negDot = s"-(${dotCentroidExplicitSql("e.embedding", "c.cvec", dim)})"
    val srcCte =
      s"""WITH nl AS (
         |  SELECT CAST(least(65536, greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS BIGINT) AS nlist
         |  FROM embeddings),
         |cent AS MATERIALIZED (
         |  SELECT cell,
         |    [CASE WHEN cn = 0 THEN CAST(ce[i] AS DOUBLE)
         |          ELSE CAST(ce[i] AS DOUBLE) / cn END for i in range(1, ${dim + 1})] AS cvec
         |  FROM (
         |    SELECT cell, ce, sqrt(${sumSqExplicitSql("ce", dim)}) AS cn
         |    FROM (SELECT embedding AS ce,
         |            row_number() OVER (
         |              ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
         |          FROM embeddings), nl
         |    WHERE cell < nlist)),
         |asg AS MATERIALIZED (
         |  SELECT id, cell, row_number() OVER (PARTITION BY id ORDER BY nd, cell) AS rn
         |  FROM (SELECT e.vec_id AS id, c.cell, $negDot AS nd
         |        FROM embeddings e CROSS JOIN cent c)),
         |ca AS (SELECT id, cell FROM asg WHERE rn <= $replicas),
         |pa AS (SELECT id, cell FROM asg WHERE rn <= $nprobe),
         |src AS (SELECT vec_id, embedding FROM embeddings)""".stripMargin
    knnGraphSql(srcCte, "embedding",
      extraPred = "\n    AND EXISTS (SELECT 1 FROM ca JOIN pa USING (cell) " +
        "WHERE ca.id = e.vec_id AND pa.id = p.probe_id)")
  }

  /** The all-pairs 5-NN graph over int8-QUANTIZED embeddings
    * ([[Embeddings.i8Quantize]]) — the storage-scale variant of
    * [[embeddingKnn]]: embeddings quantized to per-vector-scaled int8
    * (4× smaller at rest and in motion), ranking on integer dots with
    * the scales cancelling out of the cosine. Fully oracled — integer
    * dot products are exact in doubles, so the two engines agree
    * bit-for-bit rather than within fold-order noise.
    * EmbeddingsSpec gates recall@5 vs the float exact graph.
    */
  def embeddingQ8Knn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
      .withColumn("__s", Embeddings.i8Scale($"embedding"))
      .select($"vec_id",
        Embeddings.i8Quantize($"embedding", $"__s").cast("array<double>").as("qe"))
    Embeddings.knnBruteForce(
      e, $"vec_id", $"qe",
      e, $"vec_id", $"qe",
      k = K)
      .orderBy($"probe_id", $"rk")
  }

  val embeddingQ8KnnSql: String = knnGraphSql(
    """WITH src AS (
      |  SELECT vec_id,
      |    CASE WHEN s = 0 THEN [0.0 for x in embedding]
      |         ELSE [floor(CAST(x AS DOUBLE) / s + 0.5) for x in embedding]
      |    END AS qe
      |  FROM (
      |    SELECT vec_id, embedding,
      |      list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) / 127.0 AS s
      |    FROM embeddings))""".stripMargin,
    "qe")

  /** Per-label centroid cohesion: average cosine of each vector to its
    * label's mean vector — a clustering-quality aggregate exercising
    * element-wise array aggregation (the `embeddings` analogue of A5 score
    * stats). Two hash aggregates, no joins wider than the 10-row centroid
    * broadcast.
    */
  def labelCohesion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    val dim = 64
    // centroid[i] = avg over label of embedding[i]: aggregate buffer as a
    // fixed-width array via per-index sums (posexplode-free: one agg of 64
    // sums expressed as an array fold would shuffle arrays; per-index sum
    // columns keep it a plain hash agg).
    val sums = (0 until dim).map(i =>
      avg(element_at($"embedding", i + 1).cast("double")).as(s"c$i"))
    val centroids = e.groupBy($"label")
      .agg(sums.head, sums.tail: _*)
      .select($"label", array((0 until dim).map(i => col(s"c$i")): _*).as("centroid"))
    e.join(broadcast(centroids), Seq("label"))
      .select($"label", Embeddings.cosine($"embedding", $"centroid").as("cos"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"), round(avg($"cos"), 4).as("avg_cohesion"))
      .orderBy($"label")
  }

  val labelCohesionSql: String = {
    val dotVC = dotSql("e.embedding", "c.centroid")
    val normV = s"sqrt(${dotSql("e.embedding", "e.embedding")})"
    val normC = s"sqrt(${dotSql("c.centroid", "c.centroid")})"
    s"""WITH c AS (
       |  SELECT label, list(s ORDER BY idx) AS centroid FROM (
       |    SELECT label, idx, avg(v) AS s FROM (
       |      SELECT label,
       |        CAST(unnest(embedding) AS DOUBLE) AS v,
       |        generate_subscripts(embedding, 1) AS idx
       |      FROM embeddings)
       |    GROUP BY label, idx)
       |  GROUP BY label)
       |SELECT e.label, count(*) AS n,
       |  round(avg(coalesce($dotVC / nullif($normV * $normC, 0.0), 0.0)), 4) AS avg_cohesion
       |FROM embeddings e JOIN c ON e.label = c.label
       |GROUP BY e.label ORDER BY e.label""".stripMargin
  }

  /** Embedding-cosine near-duplicate PAIRS
    * ([[Embeddings.cosineNearDuplicates]]) — the brief's fifth dedup
    * family member, FULLY oracle-gated at the operator defaults — the
    * scale-honest geometry h=128, bands=16 (8-bit band keys; the old
    * 4-bit registration was ~n²/4 candidates by construction), seed 42,
    * identical-sketch pre-collapse on (output-invariant: a sketch group
    * shares every band, so collapse+expand reproduces the shared-band
    * pair set exactly). The synthetic corpus has no true near-dups (max
    * pair cosine ~0.6), so the query registers at the densest threshold
    * the table supports (0.45) — the MECHANISM under the gate is exactly
    * the production one: sign sketch over shared gaussian hyperplanes,
    * banded bucket self-join, exact rescore of candidates only. The
    * DuckDB oracle re-derives every step from the SAME
    * [[Embeddings.hyperplanes]] constants (left-associated IEEE fold,
    * `>= 0` sign rule, identical per-band bit packing), so sketching,
    * banding, candidate generation, and rescoring are cross-engine
    * verified; the recall-vs-all-pairs property at the production 0.9
    * threshold stays spec-gated on planted near-dups, and the
    * `maxBandBucketQuantile` cap on a planted degenerate corpus
    * (EmbeddingsSpec).
    */
  def cosineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.cosineNearDuplicates(e, $"vec_id", $"embedding", threshold = 0.45)
      .orderBy($"id_a", $"id_b")
  }

  /** One band key of [[Embeddings.signSketch]]+[[Embeddings.sketchBands]]
    * as exact SQL: bit jj of band `b` is plane `b·r+jj`'s dot sign
    * (explicit left-associated `0.0 + CAST(e[i] AS DOUBLE)·p_i` fold —
    * [[org.apache.spark.sql.graft.DotFExpr]]'s order — with the plane
    * constants inlined from the shared generator), packed exactly as the
    * engine's `(sketch >>> b·r) & mask`.
    */
  private def bandKeySql(
      e: String, planes: Array[Array[Double]], b: Int, r: Int): String = {
    val terms = (0 until r).map { jj =>
      val p = planes(b * r + jj)
      val sum = p.indices.map(i => s"CAST($e[${i + 1}] AS DOUBLE) * (${p(i)})")
        .mkString("0.0 + ", " + ", "")
      s"CASE WHEN ($sum) >= 0 THEN ${1L << jj} ELSE 0 END"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** Generated from the SAME hyperplanes(dim, h, seed) call the operator
    * makes. The banded candidate rule becomes a per-band key-equality OR
    * (one row per surviving pair — same set as the engine's
    * explode/join/distinct); the rescore reuses [[dotSql]] + round(_, 4)
    * with the zero-norm coalesce, the [[knnGraphSql]] cosine formula.
    */
  private[queries] def cosineDedupSql(
      dim: Int, h: Int, bands: Int, seed: Long, threshold: Double): String = {
    val planes = graft.operators.Embeddings.hyperplanes(dim, h, seed)
    val r = h / bands
    val keys = (0 until bands)
      .map(b => s"${bandKeySql("embedding", planes, b, r)} AS k$b")
      .mkString(",\n    ")
    val bandEq = (0 until bands).map(b => s"a.k$b = b.k$b").mkString(" OR ")
    val dotAB = dotSql("a.embedding", "b.embedding")
    val nA = s"sqrt(${dotSql("a.embedding", "a.embedding")})"
    val nB = s"sqrt(${dotSql("b.embedding", "b.embedding")})"
    s"""WITH sk AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    $keys
       |  FROM embeddings)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(coalesce($dotAB / nullif($nA * $nB, 0.0), 0.0), 4) AS cosine
       |  FROM sk a JOIN sk b ON a.vec_id < b.vec_id AND ($bandEq))
       |WHERE cosine >= CAST($threshold AS DOUBLE) ORDER BY id_a, id_b""".stripMargin
  }

  /** The 5-NN graph over PQ-RECONSTRUCTED vectors, portable-sample
    * codebooks, refine=0 ([[Embeddings.pqTopK]]) — codebook sampling,
    * normalization, per-subspace assignment argmin, reconstruction, and
    * scoring are all exact arithmetic, so the DuckDB oracle replays the
    * ENTIRE product-quantization mechanism bit-for-bit (the
    * q_embedding_ivf_flat discipline). The Lloyd-refined production
    * codebooks stay rows-only (q_embedding_pq) with recall spec-gates.
    */
  def embeddingPqFlat(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.pqTopK(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K, m = 8, ks = 16, refineIterations = 0, portableSample = true)
      .orderBy($"probe_id", $"rk")
  }

  /** Production PQ: per-subspace Lloyd-refined codebooks (2 iterations).
    * Rows-gated by declared design — the refinement's distributed
    * averages carry fold-order float noise — with the MECHANISM fully
    * oracled by q_embedding_pq_flat and recall vs the exact graph gated
    * in EmbeddingsSpec.
    */
  def embeddingPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.pqTopK(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K, m = 8, ks = 16, refineIterations = 2, portableSample = true)
      .orderBy($"probe_id", $"rk")
  }

  /** The 5-NN graph scored by ADC lookup tables
    * ([[Embeddings.pqTopKAdc]], refine=0, portable sample): the probe's
    * m·ks dot table replaces the per-pair dim-wide dot, and the corpus
    * enters the scoring join as (id, codes, norm) — no float vectors.
    * Fully oracled: table lookups are bit-equal to per-subspace dots of
    * the reconstruction (operand identity), so the DuckDB side replays
    * the grouped sum without ever building a table.
    */
  def embeddingPqAdc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.pqTopKAdc(
      e, $"vec_id", $"embedding",
      e, $"vec_id", $"embedding",
      k = K, m = 8, ks = 16, refineIterations = 0, portableSample = true)
      .orderBy($"probe_id", $"rk")
  }

  /** Hard-negative mining ([[Embeddings.hardNegatives]]): for every
    * vector, the 5 most-cosine-similar vectors carrying a DIFFERENT
    * label — the contrastive-training negatives step. Fully oracled: the
    * shared knn skeleton with the label inequality in the candidate
    * predicate.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    Embeddings.hardNegatives(
      e, $"vec_id", $"embedding", $"label",
      e, $"vec_id", $"embedding", $"label", k = K)
      .orderBy($"probe_id", $"rk")
  }

  private[queries] val hardNegativesSql: String =
    knnGraphSql(
      "WITH src AS (SELECT vec_id, embedding, label FROM embeddings)",
      "embedding",
      probeExtra = ", label AS pl",
      extraPred = " AND e.label <> p.pl")

  /** Diversified retrieval ([[Embeddings.mmrSelect]]): the 10 most
    * relevant-but-mutually-diverse vectors for probe 7, relevance =
    * cosine to the probe, λ=0.7 — the RAG answer-diversification shape
    * (top-k pure cosine returns near-duplicates of one mode; MMR trades
    * a little relevance for coverage). FULLY oracled since round 12:
    * greedy selection with a fixed λ and (mmr DESC, id) tie rule is
    * deterministic in the data, and each round is one argmax — the
    * recursive CTE in [[mmrDiverseSql]] replays it pick by pick. The
    * selection mechanics remain spec-gated in EmbeddingsSpec (mode
    * spread, λ=1 degeneration, partitioning invariance).
    */
  def mmrDiverse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.wide(spark, dir, "embeddings")
    val probe = e.filter($"vec_id" === 7L)
      .select($"embedding".as("__probe")).head().getSeq[Float](0)
    Embeddings.mmrSelect(
      e.filter($"vec_id" =!= 7L), $"vec_id", $"embedding",
      Embeddings.cosine($"embedding", typedLit(probe)),
      k = 10, lambda = 0.7)
      .orderBy($"rk")
  }

  /** Oracle for [[mmrDiverse]] — the greedy MMR loop as a DuckDB
    * recursive CTE (the q_semdedup argmin-replay precedent, extended to
    * an ITERATIVE argmax: the recursion state is the picked-id list, and
    * each recursive step is one LATERAL argmax over the remaining
    * candidates). Bit-faithful to [[Embeddings.mmrSelect]]:
    *
    *  - every dot product is the explicit left-associated
    *    `0.0 + CAST(a[1])*CAST(b[1]) + …` fold — [[DotFExpr]]'s exact
    *    accumulation order, required because UNROUNDED mmr values feed
    *    the argmax comparison (the [[sumSqExplicitSql]] discipline);
    *  - `max_sim_selected` = max cosine to the picked set (max is
    *    fold-order exact), 0.0 for the first pick;
    *  - `mmr` = `CAST(0.7 AS DOUBLE)·rel − (1.0 − 0.7)·ms`, reproducing
    *    Scala's `1.0 - 0.7` = 0.30000000000000004 in IEEE;
    *  - tie rule `ORDER BY mmr DESC, id LIMIT 1` = Spark's
    *    `.orderBy($"__mmr".desc, $"id").limit(1)` (no NaNs: cosines
    *    coalesce to 0.0; −0.0 vs 0.0 compare equal in both engines and
    *    fall through to the id tiebreak).
    *
    * The seed pick orders by the same full mmr expression with ms = 0.
    */
  private[queries] def mmrDiverseSql(
      dim: Int, probeId: Long, k: Int, lambda: Double): String = {
    def dotX(a: String, b: String): String =
      (0 until dim).map(i =>
        s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)")
        .mkString("0.0 + ", " + ", "")
    val lam = s"CAST($lambda AS DOUBLE)"
    val oneMinusLam = s"(CAST(1.0 AS DOUBLE) - CAST($lambda AS DOUBLE))"
    val msSub =
      s"""(SELECT max(coalesce((${dotX("r.emb", "p2.emb")}) / nullif(r.nrm * p2.nrm, 0.0), 0.0))
         |       FROM cand p2 WHERE list_contains(s.picked, p2.id))""".stripMargin
    s"""WITH RECURSIVE
       |probe AS (SELECT embedding AS pe, sqrt(${sumSqExplicitSql("embedding", dim)}) AS pn
       |          FROM embeddings WHERE vec_id = $probeId),
       |cand AS MATERIALIZED (
       |  SELECT e.vec_id AS id, e.embedding AS emb,
       |    sqrt(${sumSqExplicitSql("e.embedding", dim)}) AS nrm,
       |    coalesce((${dotX("e.embedding", "p.pe")})
       |        / nullif(sqrt(${sumSqExplicitSql("e.embedding", dim)}) * p.pn, 0.0), 0.0) AS rel
       |  FROM embeddings e, probe p WHERE e.vec_id <> $probeId),
       |sel AS (
       |  SELECT 1 AS rk, c.id, c.rel, CAST(0.0 AS DOUBLE) AS ms,
       |         $lam * c.rel - $oneMinusLam * CAST(0.0 AS DOUBLE) AS mmr,
       |         [c.id] AS picked
       |  FROM (SELECT id, rel FROM cand
       |        ORDER BY $lam * rel - $oneMinusLam * CAST(0.0 AS DOUBLE) DESC, id
       |        LIMIT 1) c
       |  UNION ALL
       |  SELECT s.rk + 1, w.id, w.rel, w.ms, w.mmr, list_append(s.picked, w.id)
       |  FROM sel s, LATERAL (
       |    SELECT r.id, r.rel, $msSub AS ms,
       |      $lam * r.rel - $oneMinusLam * $msSub AS mmr
       |    FROM cand r WHERE NOT list_contains(s.picked, r.id)
       |    ORDER BY mmr DESC, id LIMIT 1) w
       |  WHERE s.rk < $k)
       |SELECT rk, id, rel AS relevance, ms AS max_sim_selected, mmr
       |FROM sel ORDER BY rk""".stripMargin
  }

  /** Oracle for [[embeddingPqFlat]]: codebook = first `ks` rows under the
    * md5('pq:'||id) hex order, normalized with the explicit
    * left-associated sum-of-squares fold; per-(vector, subspace)
    * assignment = row_number over the explicit squared-L2 expansion with
    * the (dist, ci) tie rule (Spark: array_position of array_min);
    * reconstruction = ordered concatenation of codeword slices; scoring =
    * the shared knn skeleton with corpus vec `recon` and probe vec
    * `embedding`.
    */
  private[queries] def embeddingPqFlatSql(dim: Int, m: Int, ks: Int): String =
    knnGraphSql(pqSrcCte(dim, m, ks), "recon", probeVec = "embedding")

  /** The PQ encode chain (normalize → portable codebook → per-subspace
    * assignment → reconstruction) as the shared `src` CTE of the PQ
    * oracles — one SQL rendering of [[Embeddings.pqCodebooks]] +
    * [[Embeddings.pqEncoded]] at refine=0, used by both the
    * reconstruct-then-dot oracle (q_embedding_pq_flat) and the ADC
    * oracle (q_embedding_pq_adc).
    */
  private def pqSrcCte(dim: Int, m: Int, ks: Int): String = {
    val sub = dim / m
    // explicit left-associated fold of (n.ne[i]-c.ne[i])² over subspace
    // j's indices — replays DotFExpr.dot(diff, diff) bit-for-bit
    val dist = (0 until sub).map { i =>
      val a = s"n.ne[j.j*$sub+${i + 1}]"
      val b = s"c.ne[j.j*$sub+${i + 1}]"
      s"($a - $b) * ($a - $b)"
    }.mkString("0.0 + ", " + ", "")
    s"""WITH nrm AS MATERIALIZED (
         |  SELECT vec_id,
         |    CASE WHEN n = 0 THEN [CAST(embedding[i] AS DOUBLE) for i in range(1, ${dim + 1})]
         |         ELSE [CAST(embedding[i] AS DOUBLE) / n for i in range(1, ${dim + 1})] END AS ne
         |  FROM (SELECT vec_id, embedding,
         |          sqrt(${sumSqExplicitSql("embedding", dim)}) AS n
         |        FROM embeddings)),
         |cb AS MATERIALIZED (
         |  SELECT ci, ne FROM (
         |    SELECT row_number() OVER (
         |      ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)), vec_id) AS ci, ne
         |    FROM nrm)
         |  WHERE ci <= $ks),
         |codes AS MATERIALIZED (
         |  SELECT vec_id, j, ci FROM (
         |    SELECT n.vec_id, j.j, c.ci,
         |      row_number() OVER (PARTITION BY n.vec_id, j.j
         |        ORDER BY $dist, c.ci) AS rn
         |    FROM nrm n CROSS JOIN range(0, $m) j(j) CROSS JOIN cb c)
         |  WHERE rn = 1),
         |recon AS MATERIALIZED (
         |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon FROM (
         |    SELECT codes.vec_id, codes.j,
         |      cb.ne[codes.j*$sub+1 : codes.j*$sub+$sub] AS sub
         |    FROM codes JOIN cb USING (ci))
         |  GROUP BY vec_id),
         |src AS (SELECT e.vec_id, e.embedding, r.recon
         |        FROM embeddings e JOIN recon r USING (vec_id))""".stripMargin
  }

  /** Oracle for [[embeddingPqAdc]]: the SAME encode chain as
    * [[embeddingPqFlatSql]] (shared [[pqSrcCte]]) but the pair score
    * replays ADC's GROUPED summation — per-subspace `list_sum` slices
    * (each bit-equal to the Spark table entry `dot(probe_sub_j,
    * book(code_j))`, by operand identity with the recon slice) joined
    * left-associatively across subspaces, exactly
    * [[Embeddings.pqTopKAdc]]'s `reduce(_ + _)`. Norms stay flat folds.
    */
  private[queries] def embeddingPqAdcSql(dim: Int, m: Int, ks: Int): String = {
    val sub = dim / m
    // parenthesized as a unit: the skeleton interpolates this into
    // `<dot> / nullif(...)`, and an unwrapped `a + b / n` would divide
    // only the last subspace term
    val grouped = (0 until m).map { j =>
      s"list_sum([CAST(p.pe[i] AS DOUBLE) * e.recon[i] " +
        s"for i in range(${j * sub + 1}, ${(j + 1) * sub + 1})])"
    }.mkString("(", " + ", ")")
    knnGraphSql(pqSrcCte(dim, m, ks), "recon", probeVec = "embedding",
      dotPcOverride = grouped)
  }

  /** SemDeDup at the oracle-replayable configuration (portable centroid
    * sample, refine = 0, derived nlist — the q_embedding_ivf_flat
    * discipline) over the embeddings table at threshold 0.45 (the band
    * the synthetic vectors support, the q_cosine_dedup constant). Every
    * stage — sample order, centroid normalization, assignment argmin,
    * centroid cosine, intra-cell pair threshold, connected components,
    * keep-farthest-from-centroid selection — replays in DuckDB.
    * The Lloyd-refined production variant is exercised in EmbeddingsSpec
    * (same mechanism, non-oracle-able distributed averages).
    */
  def semDeDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Embeddings.semDeDup(
        Tables.wide(spark, dir, "embeddings"), $"vec_id", $"embedding",
        threshold = 0.45, refineIterations = 0, portableSample = true)
      .orderBy($"vec_id")
  }

  private[queries] def semDeDupSql(dim: Int, threshold: Double): String = {
    val nd = s"-(${dotCentroidExplicitSql("e.embedding", "c.cvec", dim)})"
    val dotAB = dotSql("ea.embedding", "eb.embedding")
    val nA = s"sqrt(${dotSql("ea.embedding", "ea.embedding")})"
    val nB = s"sqrt(${dotSql("eb.embedding", "eb.embedding")})"
    s"""WITH RECURSIVE nl AS (
       |  SELECT CAST(least(65536, greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS BIGINT) AS nlist
       |  FROM embeddings),
       |cent AS MATERIALIZED (
       |  SELECT cell,
       |    [CASE WHEN cn = 0 THEN CAST(ce[i] AS DOUBLE)
       |          ELSE CAST(ce[i] AS DOUBLE) / cn END for i in range(1, ${dim + 1})] AS cvec
       |  FROM (
       |    SELECT cell, ce, sqrt(${sumSqExplicitSql("ce", dim)}) AS cn
       |    FROM (SELECT embedding AS ce,
       |            row_number() OVER (
       |              ORDER BY md5('ivf:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
       |          FROM embeddings), nl
       |    WHERE cell < nlist)),
       |asg AS MATERIALIZED (
       |  SELECT id, cell, cc FROM (
       |    SELECT e.vec_id AS id, c.cell, $nd AS ndv,
       |      round(coalesce(-($nd) / nullif(sqrt(${sumSqExplicitSql("e.embedding", dim)}), 0.0), 0.0), 4) AS cc,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $nd, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1),
       |pairs AS (
       |  SELECT x.id AS id_a, y.id AS id_b
       |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.id < y.id
       |  JOIN embeddings ea ON ea.vec_id = x.id
       |  JOIN embeddings eb ON eb.vec_id = y.id
       |  WHERE round(coalesce($dotAB / nullif($nA * $nB, 0.0), 0.0), 4)
       |          >= CAST($threshold AS DOUBLE)),
       |${DedupQueries.closureCtesSql},
       |lab AS (
       |  SELECT a.id, a.cell, a.cc, coalesce(c.cluster_rep, a.id) AS cmp
       |  FROM asg a LEFT JOIN comp c ON c.node = a.id),
       |keepers AS (
       |  SELECT cmp, id AS keep_id FROM (
       |    SELECT cmp, id, row_number() OVER (PARTITION BY cmp ORDER BY cc, id) AS rn
       |    FROM lab) WHERE rn = 1)
       |SELECT l.id AS vec_id, CAST(l.cell AS INT) AS cell,
       |  l.cc AS centroid_cosine, (l.id = k.keep_id) AS keep
       |FROM lab l JOIN keepers k USING (cmp) ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_semdedup" -> (semDeDup _),
    "q_embedding_pq_flat" -> (embeddingPqFlat _),
    "q_embedding_pq" -> (embeddingPq _),
    "q_embedding_pq_adc" -> (embeddingPqAdc _),
    "q_hard_negatives" -> (hardNegatives _),
    "q_mmr_diverse" -> (mmrDiverse _),
    "q_cosine_dedup" -> (cosineDedup _),
    "q_embedding_knn" -> (embeddingKnn _),
    "q_embedding_q8_knn" -> (embeddingQ8Knn _),
    "q_embedding_ann" -> (embeddingAnn _),
    "q_embedding_ivf" -> (embeddingIvf _),
    "q_embedding_ivf_flat" -> (embeddingIvfFlat _),
    "q_label_cohesion" -> (labelCohesion _))

  /** Generated from the SAME sparsePlanes(dim=64, h, s, seed=42) call the
    * operator makes — shared-constant discipline; `AS MATERIALIZED`
    * forces DuckDB to compute each row's sketch once (inlining would
    * re-derive 96 plane sums per candidate PAIR).
    */
  val embeddingAnnSql: String = {
    val (idx, sgn) = graft.operators.Embeddings.sparsePlanes(
      64, graft.operators.Embeddings.AnnH, graft.operators.Embeddings.AnnSparsity, 42L)
    val w0 = annSketchWordSql("embedding", idx, sgn, 0, 64)
    val w1 = annSketchWordSql("embedding", idx, sgn, 64, graft.operators.Embeddings.AnnH)
    knnGraphSql(
      s"WITH src AS MATERIALIZED (SELECT vec_id, embedding, $w0 AS s0, $w1 AS s1 FROM embeddings)",
      "embedding",
      probeExtra = ", s0 AS p0, s1 AS p1",
      extraPred = "\n    AND bit_count(xor(e.s0, p.p0)) + bit_count(xor(e.s1, p.p1)) <= " +
        graft.operators.Embeddings.AnnHammingMax)
  }

  val oracles: Map[String, String] = Map(
    "q_semdedup" -> semDeDupSql(dim = 64, threshold = 0.45),
    "q_cosine_dedup" -> cosineDedupSql(
      dim = 64, h = 128, bands = 16, seed = 42L, threshold = 0.45),
    "q_embedding_knn" -> embeddingKnnSql,
    "q_embedding_q8_knn" -> embeddingQ8KnnSql,
    "q_embedding_ann" -> embeddingAnnSql,
    "q_embedding_ivf_flat" -> embeddingIvfFlatSql(dim = 64, nprobe = 12, replicas = 2),
    "q_embedding_pq_flat" -> embeddingPqFlatSql(dim = 64, m = 8, ks = 16),
    "q_embedding_pq_adc" -> embeddingPqAdcSql(dim = 64, m = 8, ks = 16),
    "q_hard_negatives" -> hardNegativesSql,
    "q_mmr_diverse" -> mmrDiverseSql(dim = 64, probeId = 7L, k = 10, lambda = 0.7),
    "q_label_cohesion" -> labelCohesionSql)
}
