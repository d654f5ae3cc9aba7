package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DotFExpr, HammingDistExpr, SparseSignSketchExpr}

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

  /** Double-precision dot product of two float/double-array columns —
    * the native codegen [[org.apache.spark.sql.graft.DotFExpr]].
    * Bit-identical (property-tested) to the higher-order
    * `aggregate(zip_with(...))` fold it replaced, which evaluated every
    * element as an interpreted lambda and dominated the embedding
    * benchmarks (same null surface: null on length mismatch or any null
    * element).
    */
  def dot(a: Column, b: Column): Column = DotFExpr.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0.0 for zero vectors (no NaN poisoning). */
  def cosine(a: Column, b: Column): Column =
    coalesce(dot(a, b) / nullif(norm(a) * norm(b), lit(0.0)), lit(0.0))

  /** Cosine from a precomputed-norm pair: scoring joins should compute
    * each row's norm ONCE in the projection below the join (`normOf`) and
    * score a candidate pair with a single dot — the norms are per-row
    * constants, and recomputing them per pair tripled the work on the
    * hottest path of every similarity query. Bitwise identical to
    * [[cosine]]: same `sqrt(dot(x, x))` value, same division and
    * zero-vector coalesce.
    */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    coalesce(dot(a, b) / nullif(normA * normB, lit(0.0)), lit(0.0))

  // ------------------------------------------------ int8 quantization

  /** Per-vector symmetric int8 scale: max|x| / 127. Callers MUST
    * materialize this as its own projection before passing it to
    * [[i8Quantize]] — the quantize lambda references the scale per
    * element, and an inlined O(dim) scale expression would turn
    * quantization O(dim²) per row (the HOF capture re-evaluation trap,
    * same as [[graft.operators.Dedup.shinglesOfTokens]]).
    */
  def i8Scale(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double")))) / 127.0

  /** Symmetric int8 quantization against a pre-materialized
    * [[i8Scale]] column: q[i] = floor(x[i]/scale + 0.5), the explicit
    * round-half-up formula — identical by construction in every engine,
    * where native round() half-way modes differ (Java HALF_UP vs
    * round-half-away). Zero vectors (scale 0) quantize to all-zeros
    * instead of dividing by zero. The payoff at 100 TB: embeddings
    * stored as int8 are 4× smaller on disk and in shuffle than float32,
    * and cosine over quantized vectors needs NO dequantization — the
    * per-vector scales cancel in the ratio, so ranking runs on integer
    * dots (exact in doubles: |dot| <= 127²·dim « 2⁵³, making
    * cross-engine comparison bit-exact rather than fold-order-dependent).
    */
  def i8Quantize(emb: Column, scale: Column): Column =
    when(scale === 0.0, transform(emb, _ => lit(0)))
      .otherwise(transform(emb, x =>
        floor(x.cast("double") / scale + lit(0.5)).cast("int")))

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
      .withColumn("__pn", norm(col("__pe")))
    val c = corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__ce"))
      .withColumn("__cn", norm(col("__ce")))
    val scored = c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosinePrenormed(col("__pe"), col("__ce"), col("__pn"), col("__cn")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  /** HARD-NEGATIVE MINING: for each probe, the top-k most-similar corpus
    * rows with a DIFFERENT label — the contrastive-training data step
    * (the negatives that look most like positives are the ones a
    * dual-encoder learns from; random negatives are too easy). Identical
    * join/rank shape to [[knnBruteForce]] with the label inequality
    * pushed INTO the join condition, so disqualified pairs are dropped
    * before the scoring projection, not filtered after.
    *
    * Output contract: (probe_id, rk, neighbor_id, cosine), rank by
    * (cosine DESC, neighbor_id). A null label never pairs (SQL null
    * semantics drop the row) — matching the oracle's `<>`.
    */
  def hardNegatives(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column, corpusLabel: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column, probeLabel: Column,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = probes.select(probeId.as("probe_id"), probeEmb.as("__pe"),
        probeLabel.as("__pl"))
      .withColumn("__pn", norm(col("__pe")))
    val c = corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__ce"),
        corpusLabel.as("__cl"))
      .withColumn("__cn", norm(col("__ce")))
    val scored = c.join(broadcast(p),
        col("neighbor_id") =!= col("probe_id") && col("__cl") =!= col("__pl"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosinePrenormed(col("__pe"), col("__ce"), col("__pn"), col("__cn")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  /** DIVERSITY-AWARE selection — Maximal Marginal Relevance (Carbonell &
    * Goldstein, SIGIR'98): greedily pick k rows maximizing
    * `λ·relevance − (1−λ)·max cosine to the already-selected set`. The
    * training-mix use: "take the k best documents, but not k copies of
    * the same mode" — pure relevance top-k drains one dense cluster,
    * MMR spreads across modes.
    *
    * Greedy is inherently sequential in k, so this is k driver-ROUND
    * iterations (not driver-side data: each round is one distributed
    * argmax over the corpus, with the selected set — at most k·dim
    * doubles, config-scale like a centroid matrix — inlined as a
    * literal). The corpus projection is materialized once
    * ([[Checkpoints.materializeFrame]]) so the k scans never re-read the
    * source. λ=1 degenerates to pure relevance ranking (spec-pinned).
    *
    * Deterministic (ties break on id ascending) but iterative-greedy, so
    * no ANSI oracle — spec-gated (the ivf/bpe convention). Output:
    * (rk, id, relevance, max_sim_selected, mmr) in selection order;
    * max_sim_selected is 0.0 for the first pick.
    */
  def mmrSelect(
      corpus: DataFrame, id: Column, emb: Column, relevance: Column,
      k: Int, lambda: Double = 0.5): DataFrame = {
    require(k >= 1, s"mmrSelect: k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmrSelect: lambda in [0,1], got $lambda")
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = Checkpoints.materializeFrame(
      corpus.select(id.cast("long").as("id"),
          emb.cast("array<double>").as("__e"),
          relevance.cast("double").as("rel"))
        .withColumn("__n", norm(col("__e"))))
    val picked = scala.collection.mutable.ArrayBuffer.empty[
      (Int, Long, Double, Double, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
    val pickedNorms = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (round <- 1 to k) {
      val remaining = base.filter(!col("id").isin(picked.map(_._2).toSeq: _*))
      val maxSim =
        if (pickedVecs.isEmpty) lit(0.0)
        else array_max(array(pickedVecs.indices.map { i =>
          cosinePrenormed(col("__e"), typedLit(pickedVecs(i)),
            col("__n"), lit(pickedNorms(i)))
        }: _*))
      val best = remaining
        .withColumn("__ms", maxSim)
        .withColumn("__mmr",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("__ms"))
        .orderBy(col("__mmr").desc, col("id"))
        .limit(1)
        .select(col("id"), col("rel"), col("__ms"), col("__mmr"), col("__e"), col("__n"))
        .collect()
      if (best.nonEmpty) {
        val r = best.head
        picked += ((round, r.getLong(0), r.getDouble(1),
          r.getDouble(2), r.getDouble(3)))
        pickedVecs += r.getSeq[Double](4)
        pickedNorms += r.getDouble(5)
      }
    }
    Checkpoints.freeFrame(base)
    picked.toSeq.toDF("rk", "id", "relevance", "max_sim_selected", "mmr")
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
    *
    * A null dot — a null embedding, or a vector narrower than the
    * hyperplanes (zip_with pads with nulls) — THROWS instead of silently
    * mapping to sketch 0: every degenerate row sharing sketch 0 would put
    * them all in the same band buckets and quietly turn the candidate
    * self-join quadratic while recall collapses.
    */
  def signSketch(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val d = dot(emb, lit(p))
      when(d >= 0, lit(1L << j)).when(d < 0, lit(0L))
        .otherwise(raise_error(lit(
          s"signSketch: null dot product — null embedding or width != ${p.length}"))
          .cast("long"))
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

  /** Band-key VECTOR of a wide sign sketch, computed directly from the
    * planes — index b holds band b's r-bit key (r = planes.length/bands),
    * bit jj of key b set iff dot(emb, plane_{b·r+jj}) >= 0. [[signSketch]]
    * packs the whole sketch into one long and tops out at h <= 63; the
    * scale-honest near-dup geometries (h = 128+, so band keys are wide
    * enough that random vectors rarely collide) need per-band keys, never
    * a single packed word. Null dots THROW, exactly as in [[signSketch]]
    * (a silently-zero sketch would herd every degenerate row into the
    * same buckets).
    */
  def bandKeyVector(emb: Column, planes: Array[Array[Double]], bands: Int): Column = {
    val h = planes.length
    require(h % bands == 0, s"bandKeyVector: h=$h not divisible by bands=$bands")
    val r = h / bands
    require(r <= 62, s"bandKeyVector: band key width $r exceeds 62 bits")
    array((0 until bands).map { b =>
      (0 until r).map { jj =>
        val p = planes(b * r + jj)
        val d = dot(emb, lit(p))
        when(d >= 0, lit(1L << jj)).when(d < 0, lit(0L))
          .otherwise(raise_error(lit(
            s"bandKeyVector: null dot product — null embedding or width != ${p.length}"))
            .cast("long"))
      }.reduce(_ + _)
    }: _*)
  }

  /** Embedding-cosine near-duplicate PAIRS (the brief's fifth dedup
    * family): all (id_a < id_b) pairs with cosine >= threshold, candidates
    * generated by shared hyperplane-LSH band buckets — the embedding
    * analogue of [[Dedup.minHashNearDuplicates]]. The candidate self-join
    * carries (rep, band, key) only; embeddings join back for the
    * surviving pairs. Recall follows the (h, bands) sketch geometry: a
    * pair at cosine c shares a band w.p. 1−(1−(1−acos(c)/π)^r)^bands —
    * ~0.996 at the default h=128/bands=16 for c = 0.9.
    *
    * Three scale guards, in candidate-generation order:
    *
    *  1. **Wide band keys** (default r = h/bands = 8 bits). The previous
    *     4-bit geometry had 16 possible buckets per band, making the
    *     self-join ~n²/4 BY CONSTRUCTION on any corpus; at r = 8 random
    *     vectors collide per band w.p. ~2⁻⁸ (sign bits, not uniform
    *     buckets), so candidate volume tracks actual similarity mass.
    *  2. **Identical-sketch pre-collapse** (the [[Dedup.simHashPairs]]
    *     hamming-0 precedent): one representative per DISTINCT sketch
    *     enters the band join, so m copies of a vector contribute one
    *     band row each instead of m — the worst hot buckets (exact-dup
    *     clusters) never reach the join. Intra-sketch pairs are emitted
    *     directly (they are the output's own dup clusters — any pair
    *     algorithm must emit them) and rep pairs expand back to member
    *     pairs afterward; both paths are rescored exactly, so the final
    *     pair set is IDENTICAL to the uncollapsed join's.
    *  3. **`maxBandBucketQuantile`** (opt-in, mirrors
    *     [[Dedup.nearDuplicatePairsExact]]'s `maxShingleDfQuantile`):
    *     drops (band, key) buckets whose size exceeds the given quantile
    *     of the observed bucket-size distribution — the outlier-hot tail
    *     that survives collapse (many DISTINCT sketches sharing a band
    *     key). One-sided trade: dropping a bucket only removes
    *     candidates, so recall can drop but no spurious pair appears.
    *
    * Oracle-registered as q_cosine_dedup at threshold 0.45 (the densest
    * the synthetic table supports — max pair cosine ~0.6) with the cap
    * OFF: the DuckDB oracle replays sketch, banding, candidate join, and
    * rescore from the shared hyperplane constants, and pre-collapse is
    * output-invariant (members of one sketch group share every band, so
    * collapse+expand reproduces exactly the shared-band pair set).
    * EmbeddingsSpec proves exactness against brute force on planted
    * near-dups at the production 0.9 and pins the capped form on a
    * planted degenerate corpus.
    */
  def cosineNearDuplicates(
      df: DataFrame, id: Column, emb: Column,
      threshold: Double = 0.9, dim: Int = 64, h: Int = 128, bands: Int = 16,
      seed: Long = 42L,
      maxBandBucketQuantile: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(dim, h, seed)
    val keyed = df.select(id.as("__id"), emb.as("__e"))
      .select(col("__id"), bandKeyVector(col("__e"), planes, bands).as("__bk"))
    // one shuffle on the sketch vector gives both the members table and
    // (via __id == __rep) the distinct-sketch representative set
    val members = keyed.withColumn("__rep",
      min(col("__id")).over(Window.partitionBy(col("__bk"))))
    // posexplode_outer, not posexplode: the plain generator's inferred
    // size(__bk) > 0 filter would be pushed below the window and re-inline
    // all h dot products into a scan filter (the Dedup explode_outer trap)
    val reps = members.filter(col("__id") === col("__rep"))
      .select(col("__rep"), posexplode_outer(col("__bk")).as(Seq("__band", "__key")))
    val repsKept = maxBandBucketQuantile match {
      case None => reps
      case Some(q) =>
        val sizes = reps.groupBy(col("__band"), col("__key"))
          .agg(count(lit(1)).as("__bs"))
        // exact interpolated percentile broadcast as one row — the
        // nearDuplicatePairsExact cap shape
        val capRow = sizes.agg(expr(s"percentile(__bs, $q)").as("__cap"))
        val kept = sizes.join(broadcast(capRow),
            col("__bs").cast("double") <= col("__cap"))
          .select(col("__band"), col("__key"))
        reps.join(kept, Seq("__band", "__key"))
    }
    val ra = repsKept.select(col("__rep").as("__ra"), col("__band"), col("__key"))
    val rb = repsKept.select(col("__rep").as("__rb"), col("__band"), col("__key"))
    // corpus-scale self-join: merge-hinted (the [[Dedup]] band-join rule
    // — equal sides, broadcast can never win, stats misestimates must
    // not pick one)
    val repPairs = ra.hint("merge").join(rb, Seq("__band", "__key"))
      .filter(col("__ra") < col("__rb"))
      .select(col("__ra"), col("__rb"))
      .distinct()
    val memA = members.select(col("__rep").as("__ra"), col("__id").as("__xa"))
    val memB = members.select(col("__rep").as("__rb"), col("__id").as("__xb"))
    // sketch groups are disjoint, so each unordered cross pair expands
    // exactly once — least/greatest canonicalizes without a distinct
    val cross = repPairs.join(memA, Seq("__ra")).join(memB, Seq("__rb"))
      .select(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"))
    // equal-sided corpus self-join (members × members): merge-hinted like
    // repPairs — a stats misestimate must never elect a broadcast build
    // of a corpus-sized side
    val intra = memA.hint("merge").join(memB,
        col("__ra") === col("__rb") && col("__xa") < col("__xb"))
      .select(col("__xa").as("id_a"), col("__xb").as("id_b"))
    val embs = df.select(id.as("__id"), emb.as("__e"))
      .withColumn("__n", norm(col("__e")))
    cross.unionByName(intra)
      .join(embs.select(col("__id").as("id_a"), col("__e").as("__ea"), col("__n").as("__na")), Seq("id_a"))
      .join(embs.select(col("__id").as("id_b"), col("__e").as("__eb"), col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosinePrenormed(col("__ea"), col("__eb"), col("__na"), col("__nb")), 4)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** IVF (inverted-file) approximate top-k — the cell-probing alternative
    * to the hyperplane-LSH [[annTopK]]: the corpus is assigned to `nlist`
    * coarse cells (nearest centroid by cosine), each probe scores only the
    * rows of its `nprobe` closest cells. Candidate volume per probe is
    * ~|corpus|·nprobe/nlist — the classic recall/candidates dial.
    *
    * Centroids start as a deterministic pseudo-random corpus sample (the
    * `nlist` vectors with the smallest seeded hash of their id) and are
    * optionally Lloyd-refined: each `refineIterations` step assigns the
    * corpus to the current cells and replaces every centroid with its
    * cell's mean (spherical k-means — means are re-normalized; a cell
    * that lost all members keeps its previous centroid). Each step is one
    * distributed corpus pass + an nlist-row collect. Centroids are
    * L2-normalized on the driver (so argmax-dot == argmax-cosine) and
    * inlined as ONE typedLit matrix: nlist·dim doubles is CONFIG-scale,
    * not data-scale, and cell assignment is one codegen'd projection — no
    * join, no shuffle, one corpus pass, mirroring how [[signSketch]]
    * inlines its hyperplanes.
    *
    * Expression-shape note: the assignment is a SINGLE zip_with over the
    * literal matrix, not nlist parallel cosine trees. nlist copies of the
    * nested-HOF cosine, once alias-inlined into exchange planning, sent
    * Catalyst's expression canonicalization into a combinatorial blowup
    * (OOM at planning time on 500 rows); one matrix + one lambda keeps
    * the tree constant-size in nlist.
    *
    * Shuffle discipline: the only data shuffle is the broadcast of the
    * (probe, cell) pairs onto the corpus cells; embeddings never shuffle.
    */
  /** nlist for [[ivfTopK]] when not set explicitly: ⌈√n⌉ clamped to
    * [4, 65536]. A CONSTANT nlist cannot scale — cells grow linearly with
    * the corpus and every probe's candidate volume grows with them;
    * nlist ≈ √n keeps per-probe work (nprobe cells of ~√n rows each, plus
    * the nlist-wide assignment projection) at ~√n, the classic IVF
    * balance point.
    */
  def deriveNlist(n: Long): Int =
    math.min(65536L, math.max(4L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** One count job per DISTINCT corpus per session for nlist derivation,
    * not one per [[ivfTopK]] call — an index-sizing heuristic tolerates a
    * stale n if files change under the same plan, and repeated calls over
    * the same corpus (every probe batch, every bench iteration) were
    * paying a full scan each. Keyed on the canonicalized analyzed plan
    * (structural equality — the same key `sameResult` uses).
    */
  private val MaxCachedCounts = 64

  // Access-order LRU bounded at MaxCachedCounts so stale plans (and the
  // SparkSessions / file indexes their keys strongly reference) become
  // reclaimable instead of accumulating for the JVM lifetime. All map
  // access is under the map's own lock, but the count() JOB runs OUTSIDE
  // it — a Spark job inside a map lock would serialize every concurrent
  // ivfTopK call on an unrelated corpus. Two threads racing the same cold
  // corpus may both count once; an index-sizing heuristic tolerates that.
  private val nlistCounts =
    new java.util.LinkedHashMap[
      (org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      java.lang.Long](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            (org.apache.spark.sql.SparkSession,
              org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
            java.lang.Long]): Boolean = size() > MaxCachedCounts
    }

  private def cachedCount(corpus: DataFrame): Long = {
    val key = (corpus.sparkSession, corpus.queryExecution.analyzed.canonicalized)
    val hit = nlistCounts.synchronized(Option(nlistCounts.get(key)))
    hit.map(_.longValue()).getOrElse {
      val n = corpus.count()
      nlistCounts.synchronized(nlistCounts.put(key, java.lang.Long.valueOf(n)))
      n
    }
  }

  private[operators] def normalizeVec(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Per-cell scores against a literal centroid matrix: -dot(emb,
    * normalized centroid); argmin == nearest by cosine (the row's own
    * norm is a constant positive factor), ties broken by cell index via
    * the struct's second field.
    *
    * Shape note (measured, do not "optimize"): the zip_with lambda runs
    * interpreted, but its inner dot is DotFExpr.eval — a tight JIT'd
    * loop — and the assignment is ~n·nlist·dim flops, dwarfed by the
    * candidate-scoring join (~n²·nprobe·replicas/nlist·dim). Unrolling
    * into array(nlist × struct(DotF…)) to chase whole-stage codegen
    * pushed the generated method past JIT limits and made the bench
    * SLOWER (2.5 s → 3.7 s at sf0.1); nlist parallel HOF-cosine trees
    * OOM'd Catalyst canonicalization. This formulation is the fast one.
    */
  private[operators] def cellScoresFor(m: Seq[Seq[Double]])(emb: Column): Column =
    zip_with(typedLit(m), sequence(lit(0), lit(m.size - 1)), (v, i) =>
      struct((-dot(emb, v)).as("negDot"), i.as("cell")))

  /** Centroid matrix shared by [[ivfTopK]] (in-query index) and
    * [[IvfIndex.build]] (persistent index): deterministic pseudo-random
    * corpus sample of `lists` vectors, optionally Lloyd-refined
    * (spherical k-means — one distributed corpus pass + an nlist-row
    * collect per iteration), L2-normalized on the driver so
    * argmax-dot == argmax-cosine. A null or width-mismatched sample
    * vector raises loudly — a silent bad centroid would skew every
    * assignment downstream.
    */
  private[operators] def computeCentroids(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      lists: Int, refineIterations: Int, seed: Long,
      portableSample: Boolean): Seq[Seq[Double]] = {
    // canonical double cast before the driver collect (works for
    // array<float> AND array<double> corpora)
    val seedMat: Seq[Seq[Double]] = {
      val sampleOrd =
        if (portableSample) md5(concat(lit("ivf:"), col("__cid").cast("string")))
        else xxhash64(col("__cid"), lit(seed))
      val rows = corpus
        .select(corpusId.as("__cid"), corpusEmb.cast("array<double>").as("__ce"))
        .orderBy(sampleOrd, col("__cid"))
        .limit(lists)
        .collect()
      val vecs = rows.map { r =>
        if (r.isNullAt(1)) {
          throw new IllegalArgumentException(
            s"ivfTopK: null embedding in centroid sample (id=${r.get(0)})")
        }
        r.getSeq[Double](1)
      }
      val dims = vecs.map(_.length).distinct
      if (dims.length > 1) {
        throw new IllegalArgumentException(
          s"ivfTopK: centroid sample has mixed embedding widths ${dims.mkString(",")}")
      }
      vecs.map(normalizeVec).toSeq
    }
    // spherical Lloyd refinement: assign, mean per cell, re-normalize.
    // The width comes from the sampled centroids themselves, never from a
    // parameter that could disagree with the data (a mismatch would
    // silently collapse every cell after one iteration).
    val dim = seedMat.headOption.map(_.length).getOrElse(0)
    (0 until refineIterations).foldLeft(seedMat) { (m, _) =>
      val assigned = corpus.select(corpusEmb.as("__ce"),
        array_min(cellScoresFor(m)(corpusEmb)).getField("cell").as("cell"))
      val means = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"),
          (0 until dim).map(i => avg(col("__ce").getItem(i)).as(s"m$i")): _*)
        .collect()
        .map { r =>
          // a per-index avg can only be null if every member's element was
          // null — raise loudly like the sample guard, never NPE
          val mean = (0 until dim).map { i =>
            if (r.isNullAt(i + 2)) {
              throw new IllegalArgumentException(
                s"ivfTopK: null mean at index $i for cell ${r.getInt(0)} " +
                  "(null embeddings in the corpus)")
            }
            r.getDouble(i + 2)
          }
          r.getInt(0) -> normalizeVec(mean)
        }
        .toMap
      m.indices.map(c => means.getOrElse(c, m(c)))
    }
  }

  /** `portableSample = true` orders the centroid sample by
    * `md5('ivf:' || id)` instead of xxhash64 — same deterministic
    * pseudo-random selection, but reproducible by any SQL engine (md5
    * hex is lowercase fixed-width everywhere; the q_stratified_sample
    * precedent). With `refineIterations = 0` the whole index —
    * sample, normalize, assignment argmin, probing — becomes exact
    * arithmetic an oracle re-derives bit-for-bit (q_embedding_ivf_flat);
    * Lloyd refinement stays on the production path (its distributed avg
    * has run-order float noise, inherently non-oracle-able).
    */
  def ivfTopK(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5, nlist: Int = -1, nprobe: Int = 4,
      replicas: Int = 1,
      refineIterations: Int = 1,
      seed: Long = 42L,
      portableSample: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    // nlist = -1 (the default) derives ⌈√n⌉ from one per-corpus cached
    // count; the explicit parameter remains for planted-cluster tests
    // and callers that size the index themselves
    val lists =
      if (nlist > 0) nlist
      else deriveNlist(cachedCount(corpus))
    val centroidMat = computeCentroids(
      corpus, corpusId, corpusEmb, lists, refineIterations, seed, portableSample)
    def cellScores(emb: Column): Column = cellScoresFor(centroidMat)(emb)
    def cellOf(emb: Column): Column = array_min(cellScores(emb)).getField("cell")
    // Multi-assignment (replicas > 1): each corpus row is indexed under its
    // `replicas` closest cells, the standard IVF fix for boundary loss — a
    // true neighbor sitting just across a Voronoi edge from the probed cell
    // is recovered through its second assignment. Candidate volume scales
    // ~replicas·nprobe/nlist. Measured on the synthetic near-random corpus
    // (recall@5 vs exact, all-pairs workload): at n=500/nlist=23 raising
    // nprobe edges out replicas at equal budget (35 %: 0.716 vs 0.679 —
    // wide-angle neighbors scatter beyond adjacent cells), the two combine
    // to 0.81 at 52 %; at n=5000/nlist=71 the same ladder reads 23 %:
    // 0.732, 34 %: 0.847, 45 %: 0.916 — recall per scanned fraction
    // IMPROVES with n because the 5-NN of a larger corpus sit at a tighter
    // top percentile of the cosine distribution, exactly the regime real
    // clustered corpora live in (planted-cluster spec: 1.0 at ~2 %).
    // struct ordering sorts by negDot then cell, so array_sort's first
    // `replicas` entries ARE the closest cells (ties broken by cell index,
    // same rule as array_min).
    val corpusAssigned =
      if (replicas == 1)
        corpus.select(
          corpusId.as("neighbor_id"), corpusEmb.as("__ce"), cellOf(corpusEmb).as("cell"))
      else
        corpus.select(
          corpusId.as("neighbor_id"), corpusEmb.as("__ce"),
          explode(transform(
            slice(array_sort(cellScores(corpusEmb)), 1, math.min(replicas, lists)),
            c => c.getField("cell"))).as("cell"))
    val corpusCells = corpusAssigned.withColumn("__cn", norm(col("__ce")))
    // each probe's nprobe closest cells (probes are small by contract)
    val probeScored = probes.select(probeId.as("probe_id"), probeEmb.as("__pe"))
      .select(col("probe_id"), col("__pe"),
        explode(cellScores(col("__pe"))).as("__c"))
    val wp = Window.partitionBy(col("probe_id")).orderBy(col("__c.negDot"), col("__c.cell"))
    val probeCells = probeScored
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nprobe)
      .select(col("probe_id"), col("__pe"), col("__c.cell").as("cell"))
      .withColumn("__pn", norm(col("__pe")))
    val scored = corpusCells.join(broadcast(probeCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosinePrenormed(col("__pe"), col("__ce"), col("__pn"), col("__cn")), 4)
          .as("cosine"))
    // with replicas > 1 a (probe, neighbor) pair can match through several
    // probed cells; collapse duplicates (identical cosine — same vectors,
    // same formula) BEFORE ranking, or row_number would hand one neighbor
    // several of the k slots. One extra hash-agg shuffle of the narrow
    // 3-column candidate table, only on the multi-assignment path.
    val distinctScored =
      if (replicas == 1) scored
      else scored.groupBy(col("probe_id"), col("neighbor_id"))
        .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    distinctScored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  // ------------------------------------------------------- SemDeDup

  /** SemDeDup (Abbas, Tirumala, Simig, Ganguli & Morcos, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): k-means-cluster the embedding
    * space, then prune SEMANTIC duplicates WITHIN each cluster — pairs
    * above a cosine threshold connect into duplicate groups, and each
    * group keeps exactly one member: the one with the LOWEST cosine to
    * its cluster centroid (the paper's keep-farthest-from-centroid
    * policy — edge examples carry more information than prototypical
    * ones), ties broken by minimum id.
    *
    * This is the semantic complement of [[cosineNearDuplicates]]: LSH
    * banding targets NEAR-EXACT vectors (cosine ≳ 0.9); SemDeDup's
    * cluster scope finds the paraphrase/boilerplate band (0.7-ish)
    * where banded sketches lose recall, at the cost of an
    * intra-cluster pair pass — the clustering IS the candidate bound
    * (cells ≈ n/nlist members), exactly the published algorithm's
    * scale argument. Centroids: [[computeCentroids]] (sample + optional
    * spherical Lloyd; `portableSample` + `refineIterations = 0` is the
    * oracle-replayable variant, the q_embedding_ivf_flat discipline).
    *
    * Returns every input row: (vec_id, cell, centroid_cosine, keep).
    * Scale shape: one assignment projection against the broadcast
    * centroid matrix (n·nlist·dim flops), one cell-keyed self-join
    * bounded by cluster sizes, CC over above-threshold edges only, one
    * labeling join. The assigned frame is materialized once for its
    * three consumers.
    */
  def semDeDup(
      df: DataFrame, id: Column, emb: Column,
      threshold: Double, nlist: Int = -1, refineIterations: Int = 1,
      seed: Long = 42L, portableSample: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"semDeDup: threshold must be in (0, 1], got $threshold")
    val src = df.select(id.cast("long").as("__id"), emb.as("__e"))
    val lists = if (nlist > 0) nlist else deriveNlist(cachedCount(src))
    val mat = computeCentroids(
      src, col("__id"), col("__e"), lists, refineIterations, seed, portableSample)
    val assigned = Checkpoints.materializeFrame(
      src
        .withColumn("__best", array_min(cellScoresFor(mat)(col("__e"))))
        .select(col("__id"), col("__e"),
          col("__best").getField("cell").as("cell"),
          // centroids are unit vectors, so dot / ||e|| IS the cosine;
          // rounded to 4 like every cross-engine score in this module
          round(coalesce(-col("__best").getField("negDot") /
            nullif(norm(col("__e")), lit(0.0)), lit(0.0)), 4)
            .as("centroid_cosine")))
    val a = assigned.select(col("cell"), col("__id").as("id_a"), col("__e").as("__ea"))
    val b = assigned.select(col("cell"), col("__id").as("id_b"), col("__e").as("__eb"))
    // intra-cell pair generation is an equal-sided corpus self-join over a
    // MATERIALIZED frame — exactly the estimate-drift class (localCheckpoint
    // frames weigh 8 bytes/row to the planner): merge-hinted so a broadcast
    // build of the corpus side is impossible by construction
    val edges = a.hint("merge").join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosine(col("__ea"), col("__eb")), 4) >= threshold)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.connectedComponents(edges, col("id_a"), col("id_b"))
    val labeled = assigned
      .join(comp, assigned("__id") === comp("node"), "left")
      .select(col("__id"), col("cell"), col("centroid_cosine"),
        coalesce(col("cluster_rep"), col("__id")).as("__comp"))
    // keep-policy: min (centroid_cosine, id) per duplicate group
    val keepers = labeled.groupBy(col("__comp"))
      .agg(min(struct(col("centroid_cosine"), col("__id"))).as("__k"))
      .select(col("__comp"), col("__k").getField("__id").as("__keepId"))
    labeled.join(keepers, Seq("__comp"))
      .select(col("__id").as("vec_id"), col("cell"), col("centroid_cosine"),
        (col("__id") === col("__keepId")).as("keep"))
  }

  // ------------------------------------------------ sketch-rank ANN

  /** Registered ANN geometry (the q_embedding_ann setting, gated by
    * EmbeddingsSpec's recall test on the real sf0.01 table): 96-bit
    * fingerprints from 8-sparse ±1 planes, hamming ball radius 44.
    * Chosen by measurement on the synthetic embeddings (near-random
    * vectors, top-5 neighbors at cosine ~0.35 — the LSH WORST case):
    * recall@5 ≈ 0.9 with ~29 % of pairs exactly rescored, where the
    * previous banded geometry needed >50 % candidates for the same
    * recall. On real corpora (tight neighbors) the ball prunes far
    * harder — see the planted-cluster spec, recall 1.0 at ~2 % scored.
    */
  val AnnH = 96
  val AnnSparsity = 8
  val AnnHammingMax = 44

  /** Seeded very-sparse ±1 projection planes (Achlioptas-style): h planes,
    * each touching `s` distinct coordinates with ±1 weights. Deterministic
    * literals in the plan, like [[hyperplanes]].
    */
  def sparsePlanes(dim: Int, h: Int, s: Int, seed: Long): (Seq[Seq[Int]], Seq[Seq[Double]]) = {
    require(s <= dim, s"sparsePlanes: sparsity $s > dim $dim")
    val rnd = new scala.util.Random(seed)
    val cfg = Seq.fill(h) {
      val idx = rnd.shuffle((0 until dim).toVector).take(s)
      val sgn = Vector.fill(s)(if (rnd.nextBoolean()) 1.0 else -1.0)
      (idx: Seq[Int], sgn: Seq[Double])
    }
    (cfg.map(_._1), cfg.map(_._2))
  }

  /** Approximate top-k by sketch-rank-rescore (the binary-fingerprint
    * index pattern): every vector gets an h-bit sparse-sign fingerprint
    * (one codegen'd projection, h·sparsity additions per row); a probe
    * ranks the corpus by fingerprint hamming distance — xor+popcount over
    * ⌈h/64⌉ longs, ~100× cheaper than a dim-wide dot — and only rows
    * inside the hamming ball (`<= hammingMax`) are exactly rescored.
    *
    * Why this shape and not band-bucketing (the previous design, still
    * used pairwise by [[cosineNearDuplicates]]): banding's candidate set
    * is fixed by (h, bands) geometry — on weak-signal corpora the bucket
    * collision floor forces >50 % of pairs through the EXACT scorer for
    * recall 0.8. The hamming ball moves the selectivity dial to the
    * threshold while the per-pair ranking cost stays 2 popcounts, so the
    * expensive exact dot runs on a fraction the banded design cannot
    * reach, and no explode/distinct machinery is needed at all.
    *
    * Plan shape: ONE corpus pass computing (sketch, norm) beside the
    * embedding, one broadcast of the (small-by-contract) probe set, and
    * the hamming ball + exact rescore fused in the SAME whole-stage-
    * codegen join stage — the embedding columns never outlive the stage,
    * only (probe_id, neighbor_id, cosine) reaches the top-k exchange.
    * This is [[knnBruteForce]]'s exact topology with the dot replaced by
    * popcounts for the ~70 % of pairs outside the ball, so it strictly
    * beats brute force whenever the ball prunes at all. When fingerprints
    * are PRE-materialized as a table column (the real index deployment —
    * they are deterministic in (planes, embedding)), pass sketches
    * through `corpusEmb`-adjacent plumbing instead and the ranking scan
    * prunes to (id, 12-byte sketch): ~5 % of the embedding bytes.
    *
    * The hamming predicate is wrapped in coalesce(_, false): a bare
    * null-rejecting join condition makes InferFiltersFromConstraints push
    * isnotnull(sparse_sign_sketch(emb)) below the fingerprint projection
    * into the corpus scan, re-evaluating the whole sketch per row —
    * doubling index-build work (plan-asserted in PlanSpec). Semantics are
    * identical: a null-sketch row is dropped either way.
    */
  def annTopK(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5, dim: Int = 64, h: Int = AnnH, sparsity: Int = AnnSparsity,
      hammingMax: Int = AnnHammingMax,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (idx, sgn) = sparsePlanes(dim, h, sparsity, seed)
    def sk(emb: Column): Column = SparseSignSketchExpr.sketch(emb, idx, sgn)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__ce"))
      .withColumn("__cn", norm(col("__ce")))
      .withColumn("__cs", sk(col("__ce")))
    val p = probes.select(probeId.as("probe_id"), probeEmb.as("__pe"))
      .withColumn("__pn", norm(col("__pe")))
      .withColumn("__ps", sk(col("__pe")))
    val scored = c.join(broadcast(p),
        col("neighbor_id") =!= col("probe_id") &&
          coalesce(
            HammingDistExpr.hamming(col("__cs"), col("__ps")) <= hammingMax,
            lit(false)))
      .select(col("probe_id"), col("neighbor_id"),
        round(cosinePrenormed(col("__pe"), col("__ce"), col("__pn"), col("__cn")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  // ------------------------------------------- product quantization (PQ)

  /** PQ codebooks `[m][ks][dim/m]` (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    * space is split into `m` subspaces and each gets its own `ks`-word
    * codebook, so a dim-wide float vector stores as `m` sub-byte codes —
    * at the registered (m=8, ks=16, dim=64) geometry that is 32 BITS per
    * vector against 256 bytes of float32, a 64× at-rest/in-shuffle
    * compression, and the whole codebook (m·ks·dim/m doubles) is a
    * driver-inlined config artifact like [[computeCentroids]]' matrix.
    *
    * Seeding mirrors the IVF discipline: a deterministic pseudo-random
    * corpus sample (`md5('pq:' || id)` hex order when `portableSample`,
    * xxhash64 otherwise), L2-normalized as FULL vectors (corpus encoding
    * normalizes the same way, so reconstructed dots approximate cosine),
    * then sliced per subspace. `refineIterations` runs per-subspace
    * Lloyd (plain Euclidean means over subvectors — NOT re-normalized;
    * subvectors are not unit) — one corpus pass + one bounded
    * (m·ks·dim/m)-cell collect per iteration; like IVF's Lloyd it is
    * production-only (distributed avg carries fold-order float noise),
    * while the refine=0 portable path is exact arithmetic an external
    * SQL oracle replays bit-for-bit (q_embedding_pq_flat).
    */
  private[graft] def pqCodebooks(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      m: Int, ks: Int, refineIterations: Int, seed: Long,
      portableSample: Boolean,
      normalize: Boolean = true): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && ks >= 1, s"pqCodebooks: need m >= 1, ks >= 1 (got $m, $ks)")
    val sampleOrd =
      if (portableSample) md5(concat(lit("pq:"), col("__cid").cast("string")))
      else xxhash64(col("__cid"), lit(seed))
    val rows = corpus
      .select(corpusId.as("__cid"), corpusEmb.cast("array<double>").as("__ce"))
      .orderBy(sampleOrd, col("__cid"))
      .limit(ks)
      .collect()
    val vecs = rows.map { r =>
      if (r.isNullAt(1)) {
        throw new IllegalArgumentException(
          s"pqCodebooks: null embedding in codebook sample (id=${r.get(0)})")
      }
      r.getSeq[Double](1)
    }
    require(vecs.length >= ks,
      s"pqCodebooks: corpus has only ${vecs.length} rows for a $ks-word " +
        "codebook — seed the index from a corpus of at least ks vectors")
    val dims = vecs.map(_.length).distinct
    require(dims.length == 1,
      s"pqCodebooks: mixed embedding widths ${dims.mkString(",")}")
    val dim = dims.head
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m $m")
    val sub = dim / m
    val seedBooks: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
      vecs.toSeq.map { v =>
        val nv = if (normalize) normalizeVec(v) else v
        nv.slice(j * sub, (j + 1) * sub)
      }
    }
    (0 until refineIterations).foldLeft(seedBooks) { (books, _) =>
      // one corpus pass: normalize, encode every subspace against the
      // current books, explode to (j, code, subvector) grain, mean per
      // cell. Map-side combine bounds the exchange at m·ks·sub cells per
      // task regardless of corpus size.
      val enc = pqEncoded(
        corpus.select(corpusEmb.as("__e")), col("__e"), books, normalize)
      val exploded = enc.select(explode(arrays_zip(
          sequence(lit(0), lit(m - 1)).as("j"),
          col("__codes").as("code"))).as("__z"), col("__ne"))
        .select(col("__z.j").as("j"), col("__z.code").as("code"), col("__ne"))
      val means = exploded.groupBy(col("j"), col("code"))
        .agg(count(lit(1)).as("__n"),
          (0 until sub).map(i =>
            avg(element_at(col("__ne"), col("j") * sub + (i + 1))).as(s"m$i")): _*)
        .collect()
        .map { r =>
          val mean = (0 until sub).map { i =>
            if (r.isNullAt(i + 3)) {
              throw new IllegalArgumentException(
                s"pqCodebooks: null mean at sub-index $i for subspace " +
                  s"${r.getInt(0)} code ${r.get(1)} (null embeddings?)")
            }
            r.getDouble(i + 3)
          }
          (r.getInt(0), r.getAs[Number](1).longValue()) -> mean
        }
        .toMap
      (0 until m).map { j =>
        (0 until ks).map(c => means.getOrElse((j, c + 1L), books(j)(c)))
      }
    }
  }

  /** Adds `__ne` (normalized double vector), `__codes` (array<long>, m
    * 1-based codeword ids) and `__recon` (the codeword concatenation —
    * the decompressed stand-in the scoring join ranks against) to `df`.
    *
    * Every intermediate is materialized as its OWN projection (`__ne`,
    * per-subspace slices, per-subspace distance arrays) — the HOF
    * capture-re-evaluation discipline of [[i8Scale]]: a lambda that
    * captured an inlined slice-of-transform expression would re-run the
    * normalization per codeword. Assignment tie-break: `array_position`
    * returns the FIRST index attaining `array_min`, i.e. min distance
    * then min codeword id — the rule the oracle replays with
    * `row_number() OVER (ORDER BY dist, ci)`.
    */
  private[graft] def pqEncoded(
      df: DataFrame, emb: Column, books: Seq[Seq[Seq[Double]]],
      normalize: Boolean = true): DataFrame = {
    val m = books.size
    val sub = books.head.head.size
    // norm materialized BEFORE the divide lambda (an inlined sqrt(dot)
    // capture would re-run the O(dim) norm once per element).
    // normalize=false (residual encoding — [[IvfPqIndex]]) takes the
    // input vector as-is, only widening to double.
    val withNe =
      if (!normalize) df.withColumn("__ne", emb.cast("array<double>"))
      else df.withColumn("__nrm", norm(emb))
        .withColumn("__ne",
          when(col("__nrm") === 0.0, emb.cast("array<double>"))
            .otherwise(transform(emb, x => x.cast("double") / col("__nrm"))))
        .drop("__nrm")
    val withSubs = (0 until m).foldLeft(withNe) { (d, j) =>
      d.withColumn(s"__sub$j", slice(col("__ne"), lit(j * sub + 1), lit(sub)))
    }
    val withDists = (0 until m).foldLeft(withSubs) { (d, j) =>
      d.withColumn(s"__d$j", transform(typedLit(books(j)), c => {
        val diff = zip_with(col(s"__sub$j"), c, (a, b) => a - b)
        dot(diff, diff)
      }))
    }
    val withCodes = withDists.withColumn("__codes",
      array((0 until m).map(j =>
        array_position(col(s"__d$j"), array_min(col(s"__d$j")))): _*))
    withCodes.withColumn("__recon",
      flatten(array((0 until m).map(j =>
        element_at(typedLit(books(j)), col("__codes").getItem(j).cast("int"))): _*)))
      .drop((0 until m).flatMap(j => Seq(s"__sub$j", s"__d$j")): _*)
  }

  /** PQ codes packed into ONE long — `m·log2(ks)` bits, code j in bits
    * [j·w, (j+1)·w). Requires m·log2(ks) <= 63 and ks a power of two.
    * This is the at-rest form: at (m=8, ks=16) a 64-dim float vector
    * stores in 4 of the long's bytes. [[pqUnpack]] inverts it.
    */
  def pqPack(codes: Column, m: Int, ks: Int): Column = {
    val w = pqCodeWidth(m, ks)
    (0 until m).map(j =>
      shiftleft(codes.getItem(j) - 1, j * w).cast("long"))
      .reduce(_ + _)
  }

  /** Inverse of [[pqPack]]: array<long> of m 1-based codeword ids. */
  def pqUnpack(packed: Column, m: Int, ks: Int): Column = {
    val w = pqCodeWidth(m, ks)
    val mask = (1L << w) - 1
    array((0 until m).map(j =>
      (shiftright(packed, j * w).bitwiseAND(lit(mask)) + 1).cast("long")): _*)
  }

  private def pqCodeWidth(m: Int, ks: Int): Int = {
    require(ks >= 2 && (ks & (ks - 1)) == 0, s"pqPack: ks must be a power of two, got $ks")
    val w = java.lang.Integer.numberOfTrailingZeros(ks)
    require(m * w <= 63, s"pqPack: m·log2(ks) = ${m * w} bits exceed one long")
    w
  }

  /** All-pairs top-k over PQ-RECONSTRUCTED corpus vectors: corpus rows
    * are encoded to m codewords and ranked by cosine(probe, codeword
    * concatenation) — the memory-bound ANN trade (64× smaller vectors at
    * rest and in shuffle; each row decompresses ONCE into its
    * reconstruction before the probe join, so scoring cost matches
    * [[knnBruteForce]] while the corpus never moves in float form).
    * Same output contract as every neighbor query here:
    * (probe_id, rk, neighbor_id, cosine), cosine rounded to 4.
    *
    * `refineIterations = 0` + `portableSample = true` is the
    * oracle-exact mode (q_embedding_pq_flat); refined codebooks are the
    * production mode, recall-gated in EmbeddingsSpec.
    */
  def pqTopK(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5, m: Int = 8, ks: Int = 16,
      refineIterations: Int = 0,
      seed: Long = 42L,
      portableSample: Boolean = false): DataFrame = {
    val books = pqCodebooks(
      corpus, corpusId, corpusEmb, m, ks, refineIterations, seed, portableSample)
    val enc = pqEncoded(corpus.select(corpusId.as("__pqid"), corpusEmb.as("__e")),
      col("__e"), books)
      .select(col("__pqid"), col("__recon"))
    knnBruteForce(
      enc, col("__pqid"), col("__recon"),
      probes, probeId, probeEmb, k)
  }

  /** PQ top-k by ASYMMETRIC DISTANCE COMPUTATION (ADC — Jégou et al.
    * 2011 §IV.A): the probe precomputes one m·ks lookup table
    * `tab[j·ks + c] = dot(probe_sub_j, book_j_c)` and every corpus row is
    * scored with m TABLE LOOKUPS + (m−1) adds instead of a dim-wide dot —
    * the compute side of the PQ trade that [[pqTopK]]'s
    * reconstruct-then-dot leaves on the table. Per scored pair the work
    * drops dim multiply-adds → m lookups (8× at dim=64/m=8), and the
    * corpus side of the join carries only (id, m codes, recon norm) —
    * the float matrix never enters the join at all (vs [[pqTopK]], which
    * re-materializes a dim-wide reconstruction per corpus row).
    *
    * Numerically EQUAL to scoring against the reconstruction, by operand
    * identity: `recon_sub_j` IS `book_j(code_j)` element-for-element, so
    * `tab(j·ks + code_j)` carries the bit-exact per-subspace dot, and the
    * left-associated sum over j replays grouped summation the oracle
    * writes as explicit per-subspace `list_sum` slices joined with `+`.
    * (Grouped ≠ the flat 64-term fold of [[pqTopK]] in IEEE rounding —
    * which is why q_embedding_pq_adc carries its own oracle SQL rather
    * than reusing q_embedding_pq_flat's.) Norms are flat folds exactly as
    * [[knnBruteForce]]: probe `norm(emb)`, corpus `norm(recon)` taken
    * once at encode time and carried as a scalar.
    *
    * Same output contract: (probe_id, rk, neighbor_id, cosine·1e-4),
    * rank by (cosine DESC, neighbor_id).
    */
  def pqTopKAdc(
      corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      probes: DataFrame, probeId: Column, probeEmb: Column,
      k: Int = 5, m: Int = 8, ks: Int = 16,
      refineIterations: Int = 0,
      seed: Long = 42L,
      portableSample: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val books = pqCodebooks(
      corpus, corpusId, corpusEmb, m, ks, refineIterations, seed, portableSample)
    val sub = books.head.head.size
    // corpus side of the join: (id, m codes, |recon|) — 4 bytes of code
    // per 32 float dims; the reconstruction exists only inside this
    // projection and is dropped before the join
    val enc = pqEncoded(
      corpus.select(corpusId.as("neighbor_id"), corpusEmb.as("__e")),
      col("__e"), books)
      .withColumn("__rn", norm(col("__recon")))
      .select(col("neighbor_id"), col("__codes"), col("__rn"))
    // probe side: one flattened m·ks table (ks·dim multiply-adds, paid
    // once per probe, amortized over every corpus row it scores).
    // Slices are materialized projections — the HOF capture discipline
    // of [[pqEncoded]]/[[i8Scale]].
    val p0 = probes.select(probeId.as("probe_id"), probeEmb.as("__pe"))
      .withColumn("__pn", norm(col("__pe")))
      .withColumn("__ped", col("__pe").cast("array<double>"))
    val withSubs = (0 until m).foldLeft(p0) { (d, j) =>
      d.withColumn(s"__ps$j",
        slice(col("__ped"), j * sub + 1, sub))
    }
    val p = withSubs
      .withColumn("__tab", flatten(array((0 until m).map(j =>
        transform(typedLit(books(j)), c => dot(col(s"__ps$j"), c))): _*)))
      .select(col("probe_id"), col("__pn"), col("__tab"))
    val adcDot = (0 until m).map(j =>
      element_at(col("__tab"),
        (col("__codes").getItem(j) + lit(j * ks)).cast("int")))
      .reduce(_ + _)
    val scored = enc.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(coalesce(adcDot / nullif(col("__pn") * col("__rn"), lit(0.0)),
          lit(0.0)), 4).as("cosine"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }
}
