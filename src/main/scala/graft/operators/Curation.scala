package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and training: benchmark decontamination, deterministic
  * stratified sampling, and repetition (duplicate-n-gram) quality signals.
  * These extend the reference's cleaning/filter stage (SURVEY §2.2/§2.3)
  * with the standard LLM-pretraining curation steps; none exist in the
  * reference — they are the 100 TB-pipeline layer the brief asks for.
  *
  * All three are shuffle-light by construction:
  *  - decontamination broadcasts the (small) benchmark shingle set and
  *    shuffles only (id, matched-shingle) hit pairs — never document text;
  *  - stratified sampling is a pure per-row predicate (zero shuffle);
  *  - repetition signals are per-row projections (zero shuffle).
  */
object Curation {

  /** Token array of a text column, or the column itself when it is
    * ALREADY an ARRAY<STRING> (r18 tokenize-once contract, the
    * [[NgramLm]] `toksExpr` pattern): callers that pre-tokenize — e.g. a
    * query materializing one [[Dedup.tokens]] scratch shared by the
    * benchmark and corpus sides — pass the array column and the operator
    * skips its own tokenization. An array caller MUST have tokenized
    * with [[Dedup.tokens]] (whitespace split, empties dropped) or an
    * equivalent, or shingles will diverge between the two sides; string
    * callers are unaffected (array inputs previously failed analysis
    * inside `split`, so no pre-existing caller changes behavior).
    */
  private def toksOf(df: DataFrame, text: Column): Column = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    df.select(text).schema.head.dataType match {
      case ArrayType(StringType, _) => text
      case _ => Dedup.tokens(text)
    }
  }

  /** Benchmark decontamination (the GPT-3/PaLM eval-overlap rule): a corpus
    * document is contaminated iff it shares at least one n-token shingle
    * with any benchmark document. Production defaults to the literature's
    * n=13; callers tune n down only for tiny synthetic corpora where no
    * 13-gram ever collides.
    *
    * Returns one row per corpus document: (id, contaminated, n_shared)
    * where n_shared counts DISTINCT shingles shared with the benchmark —
    * the audit number a curation run reports before dropping.
    *
    * Scale shape: the benchmark side (eval sets — thousands of documents,
    * not billions) collapses to a distinct shingle set and is broadcast;
    * the corpus side tokenizes once per row, and only (id, shingle) pairs
    * that actually hit the benchmark reach the per-id count aggregate. The
    * corpus text itself never shuffles, and a clean corpus costs one scan
    * plus an empty aggregate.
    */
  def contaminationMarks(
      corpus: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, benchmarkText: Column,
      n: Int = 13): DataFrame =
    contaminationMarksOnShingles(corpus, id, text,
      benchmarkShingles(benchmark, benchmarkText, n), n)

  /** The distinct benchmark n-gram set [[contaminationMarks]] broadcasts
    * — exposed so REPEATED-ARRIVAL callers (an incremental curation
    * stream decontaminating every batch against the same fixed suites)
    * can compute it ONCE, `.cache()` it, and pass it to
    * [[contaminationMarksOnShingles]] per batch: benchmark suites are
    * static artifacts, and re-shingling them per arrival is pure fixed
    * overhead (re-paid tokenize + explode + distinct every batch).
    */
  def benchmarkShingles(
      benchmark: DataFrame, benchmarkText: Column, n: Int = 13): DataFrame =
    benchmark
      // two-step projection so the token array is computed once per row
      // (shinglesOfTokens references its input ~n+2 times; see its
      // scaladoc) — and a pre-tokenized ARRAY<STRING> column passes
      // through toksOf untouched
      .select(toksOf(benchmark, benchmarkText).as("__toks"))
      .select(explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
      .distinct()

  /** [[contaminationMarks]] against a precomputed [[benchmarkShingles]]
    * frame (single column `__g`). Same plan shape: one corpus scan, the
    * shingle set broadcast, corpus text never shuffles.
    */
  def contaminationMarksOnShingles(
      corpus: DataFrame, id: Column, text: Column,
      benchShingles: DataFrame, n: Int = 13): DataFrame = {
    val corpusShingles = corpus
      .select(id.as("id"), toksOf(corpus, text).as("__toks"))
      .select(col("id"), explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
    val hits = corpusShingles
      .join(broadcast(benchShingles), Seq("__g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc already
    corpus.select(id.as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        col("n_shared").isNotNull.as("contaminated"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  /** [[contaminationMarks]] for benchmark sets too large to broadcast as
    * raw strings: the distinct benchmark shingles build a Bloom filter
    * (distributed `df.stat.bloomFilter` build — partitions fold locally,
    * bit arrays OR-merge on the driver), the corpus shingle stream is
    * pre-filtered through the broadcast sketch, and an exact shuffle join
    * against the benchmark shingles confirms the survivors. EXACT by
    * construction — Bloom filters have no false negatives, and the
    * confirm join removes every false positive — so `fpp` tunes COST,
    * never the answer (oracle-gated against the same SQL as the
    * broadcast path).
    *
    * Why this exists at 100 TB: a 10⁹-shingle contamination list is tens
    * of GB of raw strings — over any broadcast budget — but ~1.2 GB of
    * Bloom bits at 1 % fpp. The confirm join then shuffles only true
    * hits + fpp · misses of the corpus stream instead of every corpus
    * shingle, and the corpus text itself still never shuffles. The sketch
    * check is a broadcast-variable UDF (two xxhash probes per shingle; a
    * plan-embedded native expression would inline the multi-MB bit array
    * into the plan tree — strictly worse).
    */
  def contaminationMarksBloom(
      corpus: DataFrame, id: Column, text: Column,
      benchmark: DataFrame, benchmarkText: Column,
      n: Int = 13,
      expectedShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // r18: the distinct benchmark shingle set has TWO consumers — the
    // bloom-filter build (an aggregate action right here) and the exact
    // confirm join — and each re-derived tokenize + explode + distinct
    // from the benchmark scan (probe: the derivation's stages ran twice
    // per query). One size-gated scratch checkpoint feeds both (guide §5
    // cache over re-derive). Like bm25TopK's scratch, the blocks live
    // until driver GC (the returned frame's confirm join still consumes
    // them, so an eager release is impossible) — a long-lived session
    // issuing many calls amortizes via the ContextCleaner.
    val benchShingles = Checkpoints.materializeScratch(
      benchmarkShingles(benchmark, benchmarkText, n))
    val bloom = benchShingles.stat.bloomFilter("__g", expectedShingles, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf { g: String => g != null && bc.value.mightContainString(g) }
    val survivors = corpus
      .select(id.as("id"), toksOf(corpus, text).as("__toks"))
      .select(col("id"), explode(Dedup.shinglesOfTokens(col("__toks"), n)).as("__g"))
      .filter(mightContain(col("__g")))
    // exact confirm: no broadcast hint — the benchmark side of THIS join
    // is exactly the set that outgrew the broadcast budget
    val hits = survivors
      .join(benchShingles.hint("shuffle_hash"), Seq("__g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared")) // shingles are distinct per doc already
    corpus.select(id.as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        col("n_shared").isNotNull.as("contaminated"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
  }

  /** Threshold for [[stratifiedSample]]: the 8-hex-digit lowercase prefix
    * of floor(rate · 2³²), zero-padded. md5 hex output is lowercase and
    * fixed-width in every engine, so `substr(md5(key), 1, 8) < threshold`
    * compares LEXICOGRAPHICALLY equal to the numeric compare — the whole
    * predicate is portable to any SQL engine with md5(), which is what
    * makes the sample reproducible outside Spark (xxhash64 is not).
    *
    * rate = 1.0 returns the sentinel "g" (lexicographically above every
    * hex string) so keep-all truly keeps ALL: clamping to "ffffffff"
    * would silently drop the ~1-in-4·10⁹ keys whose md5 prefix is
    * exactly ffffffff under the strict `<` — at the 100 TB row counts
    * this operator targets, that boundary row actually exists.
    */
  def rateThresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) "g"
    else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Deterministic stratified sampling: keep a row iff the md5 of
    * (salt ':' key) falls under its stratum's rate threshold. The
    * per-stratum rates rebalance a corpus mix (the domain/language quota
    * step of every pretraining data recipe) without any shuffle, sort, or
    * count — a pure codegen'd filter, trivially reproducible on any engine
    * and stable under repartitioning, re-runs, and incremental appends
    * (a document's fate depends only on its key, never on which batch it
    * arrived in — the property reservoir/random sampling cannot give).
    *
    * @param strata stratum label column (e.g. language, source domain)
    * @param key    stable unique row key; drives the hash
    * @param rates  stratum label → keep rate in [0,1]
    * @param defaultRate keep rate for strata not in `rates`
    * @param salt   decorrelates this sample from any other md5-based
    *               sample of the same keys
    */
  def stratifiedSample(
      df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "graft"): DataFrame = {
    val bucket = substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8)
    val threshold = rates.foldLeft(lit(rateThresholdHex(defaultRate))) {
      case (acc, (label, rate)) => when(strata === label, lit(rateThresholdHex(rate))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Temperature-flattened corpus mixing — the multilingual pretraining
    * recipe (mBERT's exponentiated smoothing; Conneau & Lample, XLM,
    * §3.1; mT5 §3.2): sampling probabilities q_l ∝ p_l^α with α < 1
    * flatten the group (language/domain) distribution, and each group's
    * keep rate r_l = min(1, q_l · N / c_l) downsamples head groups
    * toward the target mix — no upsampling, so the budget is whatever
    * the flattened mix admits. α = 1 keeps everything; α = 0 equalizes
    * groups at the smallest group's ceiling.
    *
    * Selection reuses [[stratifiedSample]]'s portable md5-threshold
    * mechanism with the rate COMPUTED per group: keep iff
    * substr(md5(salt:key), 1, 8) < hex(floor(round(r, 9) · 2³²)) — the
    * 9-decimal rounding absorbs cross-engine pow() ulp drift before the
    * threshold is derived (the aesPriority float discipline), and
    * rate ≥ 1 takes the 'g' sentinel so keep-all keeps ALL.
    *
    * Scale shape: one tiny per-group counts aggregate, two one-row
    * aggregates over it (total, normalizer), rates broadcast back; the
    * data path itself is a single broadcast-join + codegen filter —
    * stable under repartitioning, re-runs, and incremental appends.
    */
  def temperatureMix(
      df: DataFrame, group: Column, key: Column, alpha: Double,
      salt: String = "graft"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(group.as("__grp")).agg(count(lit(1)).as("__c"))
    val tot = counts.agg(sum(col("__c")).as("__tot"))
    val powed = counts.join(broadcast(tot))
      .withColumn("__q", pow(col("__c") / col("__tot"), lit(alpha)))
    val z = powed.agg(sum(col("__q")).as("__z"))
    val rates = powed.join(broadcast(z))
      .select(col("__grp"),
        least(lit(1.0),
          round(col("__q") / col("__z") * col("__tot") / col("__c"), 9))
          .as("__rate"))
    val threshold = when(col("__rate") >= 1.0, lit("g"))
      .otherwise(lpad(lower(hex(
        floor(col("__rate") * 4294967296.0).cast("long"))), 8, "0"))
    val bucket = substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8)
    df.join(broadcast(rates), group <=> col("__grp"))
      .filter(bucket < threshold)
      .drop("__grp", "__rate")
  }

  /** Fixed-width overlapping PASSAGE CHUNKS — the corpus → retrieval/
    * training unit step (every RAG indexing pipeline and every
    * long-document pretraining recipe): whitespace tokens windowed at
    * `width` tokens every `stride` (stride < width ⇒ overlap), chunk k
    * covering tokens [k·stride, k·stride + width). The final chunk may
    * be short; empty documents yield no chunks. Returns
    * (doc_id, chunk_id, n_tokens, chunk_text).
    *
    * Scale shape: pure narrow projections + one generator — no shuffle,
    * no UDF; chunk count per doc is ⌈n/stride⌉.
    */
  /** Scalar form of [[chunkPassages]] for the SQL surface: the chunks of
    * ONE document as array<struct<chunk_id, n_tokens, chunk_text>> —
    * `LATERAL VIEW explode(chunk_passages(text, w, s))` is the SQL
    * spelling of the relation operator (same tokenization, same window
    * arithmetic; SqlSurfaceSpec pins row-for-row agreement). Empty and
    * null docs yield an empty array. `width`/`stride` arrive as columns
    * (SQL literals); non-positive or stride > width values yield
    * whatever the window arithmetic yields — the relation operator is
    * the argument-validated form.
    */
  def chunkPassagesCol(text: Column, width: Column, stride: Column): Column = {
    val toks = Dedup.tokens(text)
    val n = size(toks)
    val chunks = transform(
      sequence(lit(0), n - 1, stride), (start, i) =>
        struct(
          i.cast("int").as("chunk_id"),
          least(width, n - start).cast("int").as("n_tokens"),
          array_join(slice(toks, start + 1, width), " ").as("chunk_text")))
    when(n > 0, chunks).otherwise(
      array().cast("array<struct<chunk_id:int,n_tokens:int,chunk_text:string>>"))
  }

  def chunkPassages(
      df: DataFrame, id: Column, text: Column,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    // posexplode_outer, not posexplode — the InferFiltersFromGenerate
    // re-inlining trap documented at Dedup.nearDuplicatePairsExact; the
    // null rows it keeps for empty docs die on the explicit filter below
    df.select(id.as("doc_id"), Dedup.tokens(text).as("__toks"))
      .select(col("doc_id"), col("__toks"), size(col("__toks")).as("__n"))
      .select(col("doc_id"), col("__toks"), col("__n"),
        // the when() guard keeps sequence() from seeing an empty doc's
        // (0, -1, +stride) descending-bounds error under ANSI mode
        posexplode_outer(when(col("__n") > 0,
          sequence(lit(0), col("__n") - 1, lit(stride))))
          .as(Seq("chunk_id", "__start")))
      .filter(col("__start").isNotNull)
      .select(col("doc_id"), col("chunk_id"),
        least(lit(width), col("__n") - col("__start")).as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(width)), " ")
          .as("chunk_text"))
  }

  /** Weighted sample WITHOUT replacement — the exponential-keys scheme
    * (Efraimidis & Spirtakis, "Weighted random sampling with a
    * reservoir", IPL 2006, A-ES): each row draws u ~ Uniform(0,1]
    * deterministically from md5(salt:key) and takes priority
    * `ln(u) / w`; the k rows with the LARGEST priority are distributed
    * exactly as a sequential weighted draw without replacement. The
    * training-mix use case: sample a fixed-size corpus slice where a
    * document's inclusion odds follow its quality/importance weight,
    * reproducibly (fate is a pure function of the key — stable across
    * re-runs, repartitioning, and appends, like [[stratifiedSample]]).
    *
    * Scale shape: a zero-shuffle codegen projection (md5 + ln per row)
    * into a TakeOrdered top-k (per-partition heaps) — no global sort, no
    * per-group state; rk is assigned over the k survivors only.
    *
    * Float discipline: u is an exact 52-bit rational `(hex53 + 1) /
    * (2^52 + 1)` (never 0, so ln never sees -inf); ln carries the usual
    * cross-engine 1-ulp noise, so the priority rounds to 9 decimals
    * BEFORE ranking with the key as tie-break (the q_tfidf_terms rule).
    * A non-positive or null weight THROWS — silently dropping the row
    * would skew the sample exactly the way the weighted-quantile
    * truncation bug did.
    *
    * Output: (rk, key AS id, priority), rk 1..k by (priority DESC, key).
    */
  def weightedSample(
      df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "graft-ws"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df.select(key.as("id"), aesPriority(key, weight, salt).as("priority"))
      .orderBy(col("priority").desc, col("id"))
      .limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("priority").desc, col("id"))))
      .select(col("rk"), col("id"), col("priority"))
  }

  /** [[weightedSample]] per stratum: an independent exponential-keys
    * draw of `kPerGroup` rows within every `group` value — the
    * language-quota / source-quota form of weighted sampling (sample the
    * best-weighted N documents of EACH language, not of the pool). The
    * priority is a pure function of (salt, key), NOT of the group, so
    * regrouping the same corpus re-slices the same per-row draws —
    * moving a document between strata cannot change its priority, only
    * which quota it competes in.
    *
    * Scale shape: the per-row projection plus
    * [[ScaleOps.topKPerGroup]]'s partial-per-partition heaps — each
    * partition ships at most kPerGroup rows per local group into the
    * single exchange, never the full stratum.
    *
    * Output: (rk, grp, id, priority), rk 1..kPerGroup within each grp by
    * (priority DESC, id).
    */
  def weightedSamplePerGroup(
      df: DataFrame, group: Column, key: Column, weight: Column,
      kPerGroup: Int, salt: String = "graft-ws"): DataFrame = {
    val base = df.select(group.as("grp"), key.as("id"),
      aesPriority(key, weight, salt).as("priority"))
    ScaleOps.topKPerGroup(base, Seq("grp"), orderCol = "priority",
        tieCol = "id", k = kPerGroup, descending = true)
      .select(col("rk"), col("grp"), col("id"), col("priority"))
  }

  /** The A-ES priority `round(ln(u)/w, 9)` with u the md5-derived exact
    * 52-bit uniform in (0,1] — shared by [[weightedSample]] and
    * [[weightedSamplePerGroup]]; see weightedSample's scaladoc for the
    * float discipline. Public (and SQL-registered as `aes_priority`) so
    * pure-SQL pipelines can run Efraimidis–Spirtakis sampling with a
    * plain ORDER BY priority DESC LIMIT k.
    */
  def aesPriority(key: Column, weight: Column, salt: Column): Column = {
    val hex13 = substring(md5(concat_ws(":", salt, key.cast("string"))), 1, 13)
    val u = (conv(hex13, 16, 10).cast("long").cast("double") + lit(1.0)) /
      lit(4503599627370497.0) // 2^52 + 1
    val w = weight.cast("double")
    // + 0.0 normalizes the round's -0.0 to 0.0 (a priority within 5e-10
    // of zero rounds to a signed zero, and engines disagree on the sign);
    // IEEE leaves every other value untouched
    round(
      when(w > 0.0, log(u) / w).otherwise(raise_error(concat(
        lit("weightedSample: non-positive or null weight for key "),
        key.cast("string"))).cast("double")), 9) + lit(0.0)
  }

  private def aesPriority(key: Column, weight: Column, salt: String): Column =
    aesPriority(key, weight, lit(salt))

  /** Token-budget sequence packing — the batch-construction step between
    * a curated corpus and a trainer: assign documents to packs such that
    * each pack's token total stays within `budget` (greedy first-fit in
    * document order; a single document over budget gets a pack of its
    * own). Returns (id, n_tokens, pack_id, pack_pos).
    *
    * Greedy packing is inherently sequential WITHIN a pack, so this is
    * the library's one justified `mapPartitions` outside model/decode
    * batching: documents are split into `partitions` contiguous id ranges
    * and each range packs independently in a single linear pass. Packs
    * never cross range boundaries — the amortized waste is at most one
    * underfull pack per range, negligible when ranges carry millions of
    * tokens, and the price of never coordinating across executors.
    * pack_id = (range << 32) | local index: globally unique with zero
    * coordination.
    *
    * The range index is computed FROM THE DATA — EXACT id quantiles at
    * i/partitions (one percentile aggregate; deterministic, a pure
    * function of the id multiset) — NOT via `repartitionByRange`:
    * Spark's RangePartitioner seeds its boundary reservoir sample from
    * the rdd id, so range-partitioned boundaries (hence pack ids) SHIFT
    * between executions of the same input once partitions exceed the
    * full-sample floor. A trainer resuming from pack ids needs the
    * assignment to be a pure function of (ids, budget, partitions),
    * which this is: the physical shuffle is a hash exchange on the
    * computed range index, and the per-range counters key on the index
    * itself, not on task/partition placement. Quantile boundaries (not
    * (id−min)·p/span linear interpolation) also make the ranges
    * CARDINALITY-balanced under skewed or sparse id distributions — a
    * few outlier ids previously stretched the span until one range held
    * nearly every row and the packing pass serialized on one task.
    *
    * Aggregation-state ceiling: the default EXACT percentile buffers one
    * (id → count) entry per DISTINCT id in its partial aggregates, merged
    * into a single final buffer — the RESULT is bounded by `partitions`,
    * the STATE is O(distinct ids). Fine at oracle-gated sizes; at
    * billions of distinct ids that single merged buffer is the
    * bottleneck. `boundedStateBoundaries = true` derives the boundaries
    * from a fixed 8192-bucket id histogram instead — two constant-state
    * aggregates (min/max, then per-bucket counts), same determinism
    * guarantee (exact integer counts over a bucket layout that is a pure
    * function of min/max, so boundaries are a pure function of the id
    * multiset), boundaries land on bucket edges so ranges are
    * cardinality-balanced to within one bucket's mass. Pack VALIDITY
    * (budget, contiguity, isolation) is identical on both paths; only
    * WHERE the range cuts fall may differ, so resuming trainers must not
    * flip the flag mid-run.
    */
  def packByTokenBudget(
      df: DataFrame, id: Column, nTokens: Column,
      budget: Long, partitions: Int,
      boundedStateBoundaries: Boolean = false): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(partitions > 0, s"partitions must be positive, got $partitions")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(id.cast("long").as("id"), nTokens.cast("long").as("n"))
    val boundsOpt =
      if (boundedStateBoundaries) histogramBounds(keyed, partitions)
      else exactBounds(keyed, partitions)
    if (boundsOpt.isEmpty) {
      // empty input: empty output, same schema
      return spark.emptyDataset[(Long, Long, Long, Int)]
        .toDF("id", "n_tokens", "pack_id", "pack_pos")
    }
    val bounds: Array[Double] = boundsOpt.get
    // range = number of boundaries strictly below the id (ties go low —
    // deterministic); ids are longs well inside double precision here,
    // and even a lossy cast would only move a boundary row, never break
    // determinism, because the comparison is the same pure expression
    // for every execution
    val rangeIdx =
      if (bounds.isEmpty) lit(0)
      else size(filter(lit(bounds), b => b < col("id").cast("double"))).cast("int")
    val assigned = keyed
      .withColumn("__r", rangeIdx)
      .repartition(partitions, col("__r"))
      .sortWithinPartitions(col("__r"), col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // several range indices can share a physical partition (hash
        // placement); counters reset per RANGE so ids stay deterministic
        var cur = Int.MinValue
        var pack = 0L
        var used = 0L
        var pos = 0
        it.map { case (docId, n, r) =>
          if (r != cur) { cur = r; pack = 0L; used = 0L; pos = 0 }
          if (used > 0 && used + n > budget) { pack += 1; used = 0L; pos = 0 }
          used += n
          pos += 1
          (docId, n, (r.toLong << 32) | pack, pos)
        }
      }
    assigned.toDF("id", "n_tokens", "pack_id", "pack_pos")
  }

  /** Range boundaries as EXACT interpolated percentiles of the id
    * distribution at i/partitions — one sort-based aggregate whose result
    * is a pure function of the id multiset (no sampling, no rdd-id seed),
    * collected as partitions−1 doubles. State is O(distinct ids) — see
    * the ceiling note on [[packByTokenBudget]]. None = empty input.
    */
  private def exactBounds(keyed: DataFrame, partitions: Int): Option[Array[Double]] = {
    val ps = (1 until partitions).map(i => i.toDouble / partitions)
    val boundsRow =
      if (ps.isEmpty) keyed.agg(min(col("id")).cast("double")).head()
      else keyed.agg(expr(s"percentile(id, array(${ps.mkString(",")}))")).head()
    if (boundsRow.isNullAt(0)) None
    else if (ps.isEmpty) Some(Array.empty)
    else Some(boundsRow.getAs[scala.collection.Seq[Double]](0).toArray)
  }

  /** Bounded-state alternative to [[exactBounds]]: a fixed-width id
    * histogram (8192 buckets laid out from exact min/max), cumulative
    * counts walked on the driver, boundary i placed at the upper edge of
    * the first bucket whose cumulative mass reaches i·n/partitions.
    * Aggregation state is O(1) per task (min/max) plus ≤ 8192 groups;
    * the driver collects ≤ 8192 (bucket, count) rows regardless of data
    * size. Deterministic: exact integer counts over a bucket layout that
    * is a pure function of (min, max), so the boundaries — hence pack
    * ids — are a pure function of the id multiset, same as the exact
    * path. Bucket arithmetic runs in doubles (deterministic even when a
    * >2^53 id rounds: the same pure expression evaluates identically on
    * every execution). None = empty input.
    */
  private def histogramBounds(keyed: DataFrame, partitions: Int): Option[Array[Double]] = {
    val histBuckets = 8192
    val mm = keyed.agg(
      min(col("id")), max(col("id")), count(lit(1))).head()
    if (mm.isNullAt(0)) return None
    val lo = mm.getLong(0)
    val hi = mm.getLong(1)
    val n = mm.getLong(2)
    if (partitions == 1 || lo == hi) return Some(Array.fill(partitions - 1)(hi.toDouble + 0.5))
    // BigInt sidesteps hi−lo overflow across the full long range; width
    // fits comfortably back in a Long (≤ 2^64/8192 + 1)
    val width = ((BigInt(hi) - BigInt(lo)) / histBuckets + 1).toLong
    val bucketCol = floor((col("id").cast("double") - lo.toDouble) / width.toDouble).cast("int")
    val counts = keyed.groupBy(bucketCol.as("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("b")).collect().map(r => (r.getInt(0), r.getLong(1)))
    val bounds = new Array[Double](partitions - 1)
    var bi = 0
    var cum = 0L
    counts.foreach { case (b, c) =>
      cum += c
      // cum ≥ (bi+1)·n/partitions without division: cum·partitions ≥
      // (bi+1)·n — both sides < 2^63 for any realistic n·partitions
      while (bi < partitions - 1 && cum * partitions >= (bi + 1).toLong * n) {
        // upper edge of bucket b: strictly above every integer id in
        // buckets ≤ b, strictly below every id in buckets > b
        bounds(bi) = lo.toDouble + (b + 1).toDouble * width - 0.5
        bi += 1
      }
    }
    while (bi < partitions - 1) { bounds(bi) = hi.toDouble + 0.5; bi += 1 }
    Some(bounds)
  }

  /** Duplicate-n-gram fraction — the repetition quality signal of the
    * Gopher/MassiveText filter family: the fraction of a document's n-token
    * shingles that are repeats of an earlier shingle
    * (1 − distinct/total; 0 for documents shorter than n tokens). Highly
    * repetitive machine-generated or boilerplate text scores near 1 and is
    * dropped by a threshold filter downstream. Pure per-row projection.
    */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val total = (size(toks) - (n - 1)).cast("double")
    val distinctN = size(Dedup.shinglesOfTokens(toks, n)).cast("double")
    coalesce((lit(1.0) - distinctN / nullif(greatest(total, lit(0.0)), lit(0.0))), lit(0.0))
  }

  /** Deterministic content-addressed train/val/test assignment: bucket =
    * portable 60-bit content hash mod 100, split by cumulative percentage
    * thresholds. Hashing CONTENT (not ids or row position) is the rule
    * production pipelines converge on: the assignment survives re-crawls,
    * re-partitioning, and id churn, and byte-identical duplicates land in
    * the SAME split — so eval can never see a verbatim copy of a training
    * document through the split boundary. Pure per-row projection: zero
    * shuffle, arbitrarily parallel, and reproducible from the text alone
    * on any engine that can compute the Karp–Rabin fold
    * ([[graft.functions.TextFunctions.fingerprint60]]).
    */
  def splitColumn(text: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must be non-negative and sum <= 100, got $trainPct/$valPct")
    val b = pmod(graft.functions.TextFunctions.fingerprint60(text), lit(100L))
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Segment-level exact dedup — the CCNet/C4 paragraph-dedup shape: cut
    * each document into consecutive `segTokens`-token segments, keep only
    * the globally FIRST occurrence of each distinct segment text (ordered
    * by (id, segment-index) — the deterministic "earliest document wins"
    * rule), and reassemble each document from its surviving segments in
    * original order. Boilerplate repeated across a crawl (headers, nav
    * text, license blocks) disappears from every copy but the first, and
    * documents reduced below a keep-fraction threshold are flagged for
    * dropping rather than silently truncated.
    *
    * Returns one row per input document:
    * `(id, n_seg, n_kept, keep_frac, kept, kept_text)` — `kept` is the
    * downstream drop flag (`keep_frac >= minKeepFrac`), `kept_text` the
    * surviving segments joined by single spaces (empty when every segment
    * was claimed by an earlier document).
    *
    * Scale shape — two shuffles, both skew-immune:
    *  1. first-occurrence election is `min(struct(id, seg_idx))` grouped
    *     by segment text: partial aggregation combines map-side, so a
    *     boilerplate segment occurring 10^9 times contributes ONE partial
    *     per map task, never 10^9 rows to one reducer (the failure mode
    *     of the row_number()-window formulation of the same rule);
    *  2. reassembly groups the SURVIVING segments by id — at most the
    *     original corpus volume, shrinking with dedup rate.
    * Election state is one (id, idx) pair per DISTINCT segment per task;
    * document text never shuffles twice (losers drop before reassembly).
    */
  /** The one segmentation rule ([[segmentDedup]] + the incremental store
    * in [[IncrementalSegmentDedup]]): consecutive `segTokens`-token
    * segments of the \S+ token array — ceil(n/seg) segment starts at 0,
    * seg, 2·seg, …; slice is 1-based and clamps the trailing partial
    * segment to the token-array end; empty text yields zero segments.
    */
  private[graft] def segmentsCol(text: Column, segTokens: Int): Column = {
    val toks = Dedup.tokens(text)
    val nseg = ceil(size(toks).cast("double") / segTokens).cast("int")
    val segs = transform(sequence(lit(0), greatest(nseg - 1, lit(0))),
      i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " "))
    when(size(toks) > 0, segs).otherwise(array())
  }

  def segmentDedup(docs: DataFrame, id: Column, text: Column,
      segTokens: Int = 10, minKeepFrac: Double = 0.5): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    val base = docs.select(id.as("__id"), segmentsCol(text, segTokens).as("__segs"))
    val exploded = base.select(col("__id"),
      posexplode(col("__segs")).as(Seq("__idx", "__seg")))
    // first-occurrence election: lexicographic struct min == earliest
    // (id, idx) — the winner tuple IS the kept row, no join-back needed
    val winners = exploded.groupBy(col("__seg"))
      .agg(min(struct(col("__id"), col("__idx"))).as("__w"))
      .select(col("__w.__id").as("__id"), col("__w.__idx").as("__idx"),
        col("__seg"))
    val reassembled = winners.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("__idx"),
          col("__seg")))), s => s("__seg")), " ").as("kept_text"))
    base.select(col("__id"), size(col("__segs")).cast("long").as("n_seg"))
      .join(reassembled, Seq("__id"), "left")
      .select(col("__id").as("id"), col("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .withColumn("__frac", when(col("n_seg") === 0, lit(1.0))
        .otherwise(col("n_kept").cast("double") / col("n_seg")))
      // kept compares the RAW fraction (the oracle does too); rounding
      // only the REPORTED column keeps a borderline 0.49996 from flipping
      // the flag between engines
      .withColumn("keep_frac", round(col("__frac"), 4))
      .withColumn("kept", col("__frac") >= minKeepFrac)
      .select(col("id"), col("n_seg"), col("n_kept"), col("keep_frac"),
        col("kept"), col("kept_text"))
  }
}
