package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Deduplication operators over the `documents` table, oracle-gated
  * (SURVEY.md §2.5 D1/D2 generalized to the corpus-curation north star).
  *
  * The LSH MinHash path ([[Dedup.minHashNearDuplicates]]) is the 100 TB
  * scale path and is covered by ScalaTest; the queries here use the exact
  * variants so an external ANSI-SQL oracle can reproduce them
  * bit-for-bit.
  */
object DedupQueries {

  /** DuckDB twin of [[Dedup.tokens]] — THE one definition, shared by every
    * oracle that tokenizes (near-dup pairs here, decontamination and
    * repetition signals in [[CurationQueries]]): \S+ runs never produce
    * empty fragments, so no explicit filter is needed. Known residue
    * (same class as the documented \x1c-\x1f Python gap): Java's \s
    * includes vertical tab \x0B where RE2's does not, so a token split
    * ONLY diverges on \x0B-adjacent text — absent from every gate corpus.
    */
  private[queries] def toksSqlOf(col: String): String =
    s"regexp_extract_all($col, '\\S+')"
  private[queries] val ToksSql = toksSqlOf("text")

  /** DuckDB twin of [[graft.functions.TextFunctions.fingerprint]] over a
    * string expression: the Karp–Rabin character fold
    * acc*31 + code mod 1e9+7, seeded by the first character
    * (`list_reduce` uses element 1 as the initial accumulator — exactly
    * Spark's `aggregate(slice(codes,2,…), element_at(codes,1), …)`). THE
    * one definition; the simhash and minhash oracles both emit it.
    */
  private[queries] def krFoldSqlOf(s: String, mult: Long = 31L): String =
    s"list_reduce([CAST(unicode(c) AS BIGINT) for c in string_split($s, '')], " +
      s"(acc, x) -> (acc * $mult + x) % 1000000007)"

  /** DuckDB twin of [[graft.functions.TextFunctions.fingerprint60]]: two
    * coprime-multiplier folds combined to a 60-bit hash (see that
    * function for why one 30-bit fold is too narrow and biased for
    * Hamming-space fingerprinting).
    */
  private[queries] def krFold60SqlOf(s: String): String =
    s"(${krFoldSqlOf(s, 31L)} * 1073741824 + ${krFoldSqlOf(s, 37L)})"

  /** DuckDB twin of [[Dedup.shinglesOfTokens]] over an aliased token-array
    * column: distinct n-gram strings. `arr[i:i+n-1]` is an n-element
    * INCLUSIVE slice; `range` is end-EXCLUSIVE, so the last shingle start
    * len(arr)-n+1 needs bound len(arr)-n+2.
    */
  private[queries] def shinglesSql(arr: String, n: Int): String =
    s"list_distinct([array_to_string($arr[i:i+${n - 1}], ' ') " +
      s"for i in range(1, len($arr) - $n + 2)])"

  /** THE near-dup pair-CTE generator — one definition of the shingle /
    * candidate / jaccard SQL shape, parameterized over the source
    * relation, its text column, and the optional df-quantile stop-shingle
    * cap, so the plain, capped, cluster, and end-to-end oracles all emit
    * byte-identical structure from one place. Emits CTEs `sh`
    * [, `ex`/`dfs`/`cap`/`kept`/`exk`], `cand`, and `pairs(id_a, id_b,
    * jaccard)` (threshold applied); callers add `WITH [RECURSIVE]` and
    * select from `pairs`.
    */
  private[queries] def pairCtesSql(
      srcRel: String, textCol: String,
      threshold: Double, dfQuantileCap: Option[Double]): String = {
    val sh =
      s"""sh AS (
         |  SELECT doc_id, shingles, len(shingles) AS n FROM (
         |    SELECT doc_id,
         |      ${shinglesSql("toks", 3)} AS shingles
         |    FROM (SELECT doc_id, ${toksSqlOf(textCol)} AS toks FROM $srcRel)
         |    WHERE len(toks) >= 3))""".stripMargin
    val (capCtes, exploded) = dfQuantileCap match {
      case None =>
        ("", "(SELECT doc_id, n, unnest(shingles) AS s FROM sh)")
      case Some(q) =>
        (s"""ex AS (SELECT doc_id, n, unnest(shingles) AS s FROM sh),
            |dfs AS (SELECT s, count(*) AS df FROM ex GROUP BY s),
            |cap AS (SELECT quantile_cont(df, $q) AS cap FROM dfs),
            |kept AS (SELECT s FROM dfs, cap WHERE CAST(df AS DOUBLE) <= cap),
            |exk AS (SELECT ex.doc_id, ex.n, ex.s FROM ex JOIN kept USING (s)),
            |""".stripMargin, "exk")
    }
    s"""$sh,
       |${capCtes}cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS c
       |  FROM $exploded a
       |  JOIN $exploded b USING (s)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |pairs AS (
       |  SELECT id_a, id_b, round(CAST(c AS DOUBLE) / (na + nb - c), 4) AS jaccard
       |  FROM cand
       |  WHERE round(CAST(c AS DOUBLE) / (na + nb - c), 4) >= $threshold)""".stripMargin
  }

  /** Connected-components closure over `pairs` — CTEs `edges`, `reach`,
    * `comp(node, cluster_rep)`; requires the caller's WITH to be
    * RECURSIVE. Shared by the cluster and end-to-end oracles.
    */
  private[queries] val closureCtesSql: String =
    """edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(node, rr) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.rr = e.a),
      |comp AS (SELECT node, min(rr) AS cluster_rep FROM reach GROUP BY node)""".stripMargin

  /** D1/D2 exact dedup as keyed last-write-wins representative selection:
    * one row per normalized-text key, lowest doc_id wins (the reference's
    * hash-set drop at src/resilient_scraper.py:352-358, made distributed
    * and idempotent). One shuffle on the key. The key is
    * `text.strip().lower()` (resilient_scraper.py:354) — Python strip, so
    * [[graft.functions.TextFunctions.pyStrip]] rather than ASCII-space
    * trim. The oracle strips with
    * [[graft.functions.TextFunctions.PyWsRe2Class]] — exactly Unicode
    * White_Space == Java's (?U)\s (spec-pinned char-by-char), so the
    * STRIP step agrees cross-engine on every input; the residues are
    * Python's extra \x1c-\x1f (both engines keep them, see pyStrip) and
    * the `lower()` step itself, which is engine-sensitive beyond ASCII
    * (JDK context-sensitive casing: final sigma, dotted İ) — exact
    * cross-engine agreement of the WHOLE key therefore still assumes the
    * corpus' cased text is ASCII, which the gate corpora are
    * (spec-pinned by TextFunctionsSpec's corpus scan).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // payload excludes text: the key is derived from it, but the output
    // never returns it — keeping it out of the aggregate's buffer keeps
    // the document bodies out of the shuffle
    Dedup.exact(Tables(spark, dir, "documents"),
      lower(graft.functions.TextFunctions.pyStrip($"text")), $"doc_id",
      payload = Seq("doc_id", "lang", "source", "n_chars"))
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val exactDedupSql: String = {
    val ws = graft.functions.TextFunctions.PyWsRe2Class
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |QUALIFY row_number() OVER (
       |  PARTITION BY lower(regexp_replace(text, '^$ws+|$ws+$$', '', 'g'))
       |  ORDER BY doc_id) = 1
       |ORDER BY doc_id""".stripMargin
  }

  /** Near-duplicate pairs by 3-token-shingle Jaccard >= 0.5, exact
    * inverted-index algorithm (see [[Dedup.nearDuplicatePairsExact]]).
    */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.nearDuplicatePairsExact(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  // Same shingle definition as Dedup.wordShingles(n=3): whitespace tokens,
  // consecutive triples joined by single spaces, distinct; docs under 3
  // tokens yield no shingles and are excluded. Same count-based identity
  // jaccard = c / (na + nb - c).
  val nearDupPairsSql: String =
    s"""WITH ${pairCtesSql("documents", "text", 0.5, None)}
      |SELECT id_a, id_b, jaccard FROM pairs
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash LSH near-duplicate pairs — the flagship probabilistic dedup
    * operator ([[Dedup.minHashNearDuplicates]]), oracle-gated END TO END in
    * its portable-hash mode: k=64 seeded universal-hash permutations over
    * Karp–Rabin shingle hashes, 16 bands × 4 rows, banded bucket
    * self-join, exact Jaccard verification. The DuckDB oracle re-derives
    * the signatures from the SAME `Dedup.perms(64, 42)` constants
    * (embedded as SQL literals below — shared-constant discipline) and
    * must reproduce the identical pair set: candidate generation included,
    * not just the final Jaccard check. The xxhash64 production hash is
    * covered by DedupSpec's exactness-vs-brute-force and hot-bucket
    * tests; the banding/bucketing MECHANISM is identical in both modes.
    */
  def minHashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.minHashNearDuplicates(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text",
      threshold = 0.5, k = 64, bands = 16, shingleLen = 3, seed = 42L,
      portable = true)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  // Signature re-derivation: per-shingle KR hash → k permutations
  // (a_i·h + b_i) mod p with the engine's own constants → min per
  // permutation → 4-long band slices rendered "<band>:<v1>,…" (decimal
  // rendering is injective, so string equality == slice equality) →
  // bucket self-join → distinct candidate pairs → exact Jaccard.
  // The threshold is applied to the UNROUNDED double: c and (na+nb−c) are
  // exact integers, so the IEEE quotient is bit-identical cross-engine.
  val minHashPairsSql: String = {
    val (as, bs) = Dedup.perms(64, 42L)
    val aLit = as.mkString("[", ", ", "]")
    val bLit = bs.mkString("[", ", ", "]")
    val p = Dedup.minHashModulus
    s"""WITH sh AS (
       |  SELECT doc_id, shingles FROM (
       |    SELECT doc_id, ${shinglesSql("toks", 3)} AS shingles
       |    FROM (SELECT doc_id, $ToksSql AS toks FROM documents)
       |    WHERE len(toks) >= 3)),
       |sig AS (
       |  SELECT doc_id,
       |    [list_min([(($aLit)[i] * h + ($bLit)[i]) % $p for h in hv])
       |     for i in range(1, 65)] AS sig
       |  FROM (SELECT doc_id, [${krFoldSqlOf("s")} for s in shingles] AS hv FROM sh)),
       |bnd AS (
       |  SELECT doc_id, b,
       |    CAST(b - 1 AS VARCHAR) || ':' ||
       |      array_to_string(list_slice(sig, (b-1)*4 + 1, (b-1)*4 + 4), ',') AS bk
       |  FROM sig, range(1, 17) t(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM bnd x JOIN bnd y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
       |      / (len(a.shingles) + len(b.shingles)
       |         - len(list_filter(a.shingles, s -> list_contains(b.shingles, s)))) AS j
       |  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id)
       |SELECT id_a, id_b, round(j, 4) AS jaccard FROM pairs
       |WHERE j >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The skew-capped production variant of [[nearDupPairs]]: shingles in
    * the hot tail of the document-frequency distribution (above the
    * p99.9 df quantile, computed from the corpus itself) are dropped
    * before the self-join (stop-shingle pruning — see
    * [[Dedup.nearDuplicatePairsExact]]). The quantile cap BINDS at every
    * scale factor of the synthetic corpus (sf0.01: cap 6.0 vs max df 7;
    * sf0.1: cap ~21 vs max df 25) while keeping the full pair yield — a
    * constant cap tight enough to bind at sf0.01 erased all 256 sf0.1
    * pairs, whose 16-to-25-member near-dup clusters pushed every shared
    * shingle past it. The oracle verifies df-aggregate, quantile and
    * prune semantics cross-engine.
    */
  def nearDupPairsCapped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.nearDuplicatePairsExact(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text",
      threshold = 0.5, maxShingleDfQuantile = Some(0.999))
      .orderBy($"id_a", $"id_b")
  }

  val nearDupPairsCappedSql: String =
    s"""WITH ${pairCtesSql("documents", "text", 0.5, Some(0.999))}
      |SELECT id_a, id_b, jaccard FROM pairs
      |ORDER BY id_a, id_b""".stripMargin

  /** Prefix-filtered exact Jaccard join ([[Dedup.prefixJaccardPairs]],
    * AllPairs/PPJoin) — all three candidate filters are LOSSLESS, so the
    * oracle is the SAME full inverted-index SQL as q_near_dup_pairs: the
    * gate proves the filtered join loses nothing, the same
    * cost-differs-answer-must-not discipline as q_price_quantiles_2pass.
    * Candidate-count reduction is pinned by DedupSpec.
    */
  def jaccardPrefixPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.prefixJaccardPairs(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text", threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** Per-document SimHash fingerprints, oracle-gated end to end: the token
    * hash is the Karp–Rabin character fold already proven cross-engine by
    * q_fingerprints, so DuckDB reproduces every step — per-token hash,
    * per-bit vote, sign, assembly — bit-for-bit (see [[Dedup.simHash]] for
    * the 30-bit-entropy trade; the xxhash64 production default is covered
    * by DedupSpec's exactness tests). The fingerprint is a single
    * codegen'd projection either way; the downstream near-dup grouping at
    * scale is [[Dedup.simHashNearDuplicates]] — Charikar sorted-rotation
    * candidates over these 8-byte values (ScalaTest-gated; its output
    * hinges on physical partition boundaries, which an external SQL
    * oracle cannot reproduce).
    */
  def simHashFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.wide(spark, dir, "documents")
      .select($"doc_id",
        Dedup.simHash(Dedup.tokens(lower($"text")),
          graft.functions.TextFunctions.fingerprint).as("simhash"))
      .orderBy($"doc_id")
  }

  /** DuckDB twin of [[Dedup.simHash]] with the KR token hash, over a
    * hash-list column: per-bit +1/−1 vote via list_sum, sign → bit,
    * disjoint-bit sum = OR. KR values stay < 2^30, so only bits 0-29 can
    * vote positive (higher bits provably 0 — range(0, 30)). THE one
    * definition, shared by the fingerprint and pairs oracles.
    */
  private[queries] def simHashVoteSqlOf(hs: String, bits: Int = 30): String =
    s"""CAST(CASE WHEN len($hs) = 0 THEN 0 ELSE list_sum(
       |    [CASE WHEN list_sum([CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END for h in $hs]) > 0
       |          THEN (CAST(1 AS BIGINT) << k) ELSE 0 END for k in range(0, $bits)]) END AS BIGINT)""".stripMargin

  // Mirrors simHash(tokenHash = fingerprint): per-token KR fold, vote,
  // assemble — the same generator the pairs oracle re-derives from.
  val simHashSql: String =
    s"""SELECT doc_id,
      |  ${simHashVoteSqlOf("hs")} AS simhash
      |FROM (
      |  SELECT doc_id,
      |    [${krFoldSqlOf("t")} for t in ${toksSqlOf("lower(text)")}] AS hs
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Charikar sorted-rotation SimHash pairs over the documents table
    * ([[Dedup.simHashNearDuplicates]]), FULLY oracle-gated: boundary
    * recovery made the output equal to the partition-AGNOSTIC global
    * sliding-window rule (DedupSpec proves exact equality under
    * adversarial 48-way partitioning), and with the portable KR token
    * hash (the q_simhash / q_minhash_pairs precedent) that global rule is
    * plain ANSI SQL — rotations are exact HUGEINT arithmetic on the
    * fingerprints, the per-rotation sliding window is `lag(·, j) OVER
    * (PARTITION BY rotation ORDER BY rv, id)`, hamming is
    * `bit_count(xor(...))`, and the hamming-0 equi-join and min-hamming
    * dedup translate directly. The DuckDB oracle therefore verifies the
    * CANDIDATE RULE itself — rotation, ordering, windowing, recovery —
    * not just per-pair scoring. The xxhash64 production hash keeps
    * DedupSpec's no-false-positives / hamming-0-exhaustive / recall-floor
    * gates.
    *
    * Token hash = [[graft.functions.TextFunctions.fingerprint60]], NOT
    * the single 30-bit fold: one fold's value range ([0, 1e9+7) < 2^30)
    * biases bit 29 and truncates the vote space, putting ~2.8k unrelated
    * sf0.01 documents within Hamming 3 (measured). With the 60-bit
    * two-fold hash the registered output is a HIGH-PRECISION near-dup
    * set: 456 pairs at sf0.01 of which 89 % have token-set Jaccard
    * >= 0.7 (only 5 below 0.5), recovering 21 of the 25 exact
    * shingle-Jaccard pairs plus the word-order-permuted near-dups that
    * 3-shingle Jaccard misses by construction — SimHash measures token
    * MULTISET similarity, insensitive to ordering, which is exactly its
    * role in the dedup family.
    */
  def simHashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Dedup.simHashNearDuplicates(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text", maxHamming = 3,
      rotations = 8, window = 4,
      tokenHash = graft.functions.TextFunctions.fingerprint60)
      .orderBy($"id_a", $"id_b")
  }

  /** The global-rule oracle of [[simHashPairs]], generated from the same
    * (rotations, window, maxHamming) parameters the operator runs.
    * Rotation r of a 64-bit fingerprint as exact integer arithmetic
    * (fp is non-negative — fingerprint60 SimHash values live in
    * [0, 2^60), so the sign bit is never set):
    * rv_unsigned = (fp · 2^(step·r)) mod 2^64 + fp div 2^(64−step·r),
    * then two's-complement-mapped to signed BIGINT so ORDER BY matches
    * Spark's signed-long sort.
    */
  private[queries] def simHashPairsSqlOf(
      rotations: Int, window: Int, maxHamming: Int): String = {
    val step = 64 / rotations
    val mulCase = (0 until rotations)
      .map(r => s"WHEN $r THEN ${BigInt(1) << (step * r)}")
      .mkString("CASE r ", " ", " END")
    val lagBlocks = (1 to window).map(j =>
      s"""  SELECT id, fp,
         |    lag(id, $j) OVER (PARTITION BY r ORDER BY rv, id) AS pid,
         |    lag(fp, $j) OVER (PARTITION BY r ORDER BY rv, id) AS pfp
         |  FROM rot""".stripMargin).mkString("\n  UNION ALL\n")
    s"""WITH fp AS (
       |  SELECT id, ${simHashVoteSqlOf("hs", bits = 60)} AS fp
       |  FROM (SELECT doc_id AS id,
       |          [${krFold60SqlOf("t")} for t in ${toksSqlOf("lower(text)")}] AS hs
       |        FROM documents
       |        WHERE regexp_matches(text, '\\S') AND doc_id IS NOT NULL)),
       |rot AS (
       |  SELECT id, fp, r,
       |    CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616
       |              ELSE u END AS BIGINT) AS rv
       |  FROM (
       |    SELECT id, fp, r,
       |      (CAST(fp AS HUGEINT) * ($mulCase)) % CAST('18446744073709551616' AS HUGEINT)
       |        + CASE WHEN r = 0 THEN 0 ELSE fp >> (64 - $step * r) END AS u
       |    FROM fp, range(0, $rotations) t(r))),
       |wp AS (
       |  SELECT least(id, pid) AS id_a, greatest(id, pid) AS id_b,
       |         bit_count(xor(fp, pfp)) AS hamming
       |  FROM (
       |$lagBlocks)
       |  WHERE pid IS NOT NULL),
       |ep AS (
       |  SELECT a.id AS id_a, b.id AS id_b, 0 AS hamming
       |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.id < b.id)
       |SELECT id_a, id_b, CAST(min(hamming) AS INT) AS hamming
       |FROM (SELECT * FROM wp WHERE hamming <= $maxHamming UNION ALL SELECT * FROM ep)
       |GROUP BY id_a, id_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Near-dup CLUSTERS: the pair graph of [[nearDupPairs]] collapsed to
    * connected components ([[Dedup.connectedComponents]]) with one
    * representative (min doc_id) per cluster — the canonical final stage
    * of MinHash/SimHash dedup. A pair list alone over-deletes (dropping
    * the greater id of every pair can kill every member of a triangle);
    * components make the keep decision per cluster, exactly one survivor
    * each. The oracle computes the same transitive closure through a
    * recursive CTE — a completely different algorithm (BFS fixpoint vs
    * iterated min-label joins) agreeing on the exact clustering.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.nearDuplicatePairsExact(
      Tables.wide(spark, dir, "documents"), $"doc_id", $"text", threshold = 0.5)
    val comp = Dedup.connectedComponents(pairs, $"id_a", $"id_b")
    val sizes = comp.groupBy($"cluster_rep").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("cluster_rep"))
      .select($"node".as("doc_id"), $"cluster_rep", $"cluster_size",
        ($"node" === $"cluster_rep").as("keep"))
      .orderBy($"doc_id")
  }

  val dedupClustersSql: String =
    // pair CTEs and closure from the SAME generators as the pair oracle —
    // the clustering is verified on byte-identically the same pair SQL
    // structure the pair query verifies
    s"""WITH RECURSIVE ${pairCtesSql("documents", "text", 0.5, None)},
      |$closureCtesSql,
      |sizes AS (SELECT cluster_rep, count(*) AS cluster_size
      |          FROM comp GROUP BY cluster_rep)
      |SELECT c.node AS doc_id, c.cluster_rep, s.cluster_size,
      |  c.node = c.cluster_rep AS keep
      |FROM comp c JOIN sizes s USING (cluster_rep)
      |ORDER BY doc_id""".stripMargin

  /** Span gram width for the registered duplicate-span query. */
  private val SpanK = 40

  /** Duplicate-SPAN summary per source — character-level exact substring
    * dedup (see [[graft.operators.SpanDedup]] for the Lee et al. framing
    * and the 100 TB contract: grams never shuffle, no pair join, integer
    * interval-union coverage). Whole-doc and shingle dedup cannot see
    * these spans; this query quantifies how much duplicated TEXT, not how
    * many duplicated documents, each source carries.
    */
  def duplicateSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.wide(spark, dir, "documents")
    val cov = graft.operators.SpanDedup
      .duplicateSpanCoverage(docs, "doc_id", "text", SpanK, carry = Seq("source"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs_hit"),
        sum($"n_dup_pos").cast("long").as("n_dup_positions"),
        sum($"dup_chars").cast("long").as("dup_chars"))
    val totals = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum(length($"text")).cast("long").as("n_chars"))
    totals.join(cov, Seq("source"), "left")
      .select($"source", $"n_docs",
        coalesce($"n_docs_hit", lit(0L)).as("n_docs_hit"),
        coalesce($"n_dup_positions", lit(0L)).as("n_dup_positions"),
        coalesce($"dup_chars", lit(0L)).as("dup_chars"),
        round(coalesce($"dup_chars", lit(0L)).cast("double") / $"n_chars", 4)
          .as("dup_char_share"))
      .orderBy($"source")
  }

  val duplicateSpansSql: String =
    s"""WITH pos AS (
       |  SELECT doc_id, source, u.i AS i, substr(text, u.i, $SpanK) AS g
       |  FROM documents, unnest(range(1, greatest(len(text) - $SpanK + 2, 1))) AS u(i)),
       |dup AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |hits AS (SELECT p.doc_id, p.source, p.i FROM pos p JOIN dup d ON d.g = p.g),
       |cov AS (SELECT doc_id, source, i,
       |          coalesce(least($SpanK, i - lag(i) OVER (
       |            PARTITION BY doc_id ORDER BY i)), $SpanK) AS c
       |        FROM hits),
       |perdoc AS (SELECT doc_id, source, count(*) AS np, CAST(sum(c) AS BIGINT) AS dc
       |           FROM cov GROUP BY doc_id, source),
       |persrc AS (SELECT source, count(*) AS n_docs_hit,
       |             CAST(sum(np) AS BIGINT) AS n_dup_positions,
       |             CAST(sum(dc) AS BIGINT) AS dup_chars
       |           FROM perdoc GROUP BY source),
       |totals AS (SELECT source, count(*) AS n_docs,
       |             CAST(sum(len(text)) AS BIGINT) AS n_chars
       |           FROM documents GROUP BY source)
       |SELECT t.source, t.n_docs,
       |  coalesce(p.n_docs_hit, 0) AS n_docs_hit,
       |  coalesce(p.n_dup_positions, 0) AS n_dup_positions,
       |  coalesce(p.dup_chars, 0) AS dup_chars,
       |  round(CAST(coalesce(p.dup_chars, 0) AS DOUBLE) / t.n_chars, 4) AS dup_char_share
       |FROM totals t LEFT JOIN persrc p ON p.source = t.source
       |ORDER BY t.source""".stripMargin

  /** Duplicate-span REMOVAL under the oracle — every changed doc's kept
    * text byte-for-byte (see [[graft.operators.SpanDedup.removeDuplicateSpans]]
    * for the canonical-keeper rule). The strongest gate this operator can
    * get: the external engine reconstructs the rewritten STRINGS, not
    * just counts.
    */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.wide(spark, dir, "documents")
    graft.operators.SpanDedup.removeDuplicateSpans(docs, "doc_id", "text", SpanK)
      .select($"doc_id", $"removed_chars",
        length($"kept_text").cast("long").as("kept_len"), $"kept_text")
      .orderBy($"doc_id")
  }

  val spanRemovalSql: String =
    s"""WITH pos AS (
       |  SELECT doc_id, u.i AS i, substr(text, u.i, $SpanK) AS g
       |  FROM documents, unnest(range(1, greatest(len(text) - $SpanK + 2, 1))) AS u(i)),
       |dup AS (SELECT g, min(doc_id) AS md FROM pos GROUP BY g
       |        HAVING count(DISTINCT doc_id) >= 2),
       |canon AS (SELECT d.g, d.md, min(p.i) AS mp
       |          FROM dup d JOIN pos p ON p.g = d.g AND p.doc_id = d.md
       |          GROUP BY d.g, d.md),
       |marked AS (SELECT p.doc_id, p.i FROM pos p JOIN canon c ON c.g = p.g
       |           WHERE NOT (p.doc_id = c.md AND p.i = c.mp)),
       |brk AS (SELECT doc_id, i,
       |          CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > $SpanK
       |               THEN 1 ELSE 0 END AS b
       |        FROM marked),
       |isl AS (SELECT doc_id, i, sum(b) OVER (
       |          PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
       |        FROM brk),
       |islands AS (SELECT doc_id, island, min(i) AS s, max(i) + $SpanK - 1 AS e
       |            FROM isl GROUP BY doc_id, island),
       |gaps AS (SELECT doc_id,
       |           coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
       |           s - 1 AS ge
       |         FROM islands),
       |tails AS (SELECT i.doc_id, max(i.e) + 1 AS gs, len(d.text) AS ge
       |          FROM islands i JOIN documents d ON d.doc_id = i.doc_id
       |          GROUP BY i.doc_id, len(d.text)),
       |segs AS (SELECT s.doc_id, s.gs,
       |           substr(d.text, s.gs, greatest(s.ge - s.gs + 1, 0)) AS seg
       |         FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tails) s
       |         JOIN documents d ON d.doc_id = s.doc_id),
       |kept AS (SELECT doc_id, string_agg(seg, '' ORDER BY gs) AS kept_text
       |         FROM segs GROUP BY doc_id),
       |removed AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
       |            FROM islands GROUP BY doc_id)
       |SELECT r.doc_id, r.removed_chars,
       |  CAST(len(k.kept_text) AS BIGINT) AS kept_len, k.kept_text
       |FROM removed r JOIN kept k ON k.doc_id = r.doc_id
       |ORDER BY r.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_span_removal" -> (spanRemoval _),
    "q_duplicate_spans" -> (duplicateSpans _),
    "q_exact_dedup" -> (exactDedup _),
    "q_near_dup_pairs" -> (nearDupPairs _),
    "q_near_dup_pairs_capped" -> (nearDupPairsCapped _),
    "q_jaccard_prefix_pairs" -> (jaccardPrefixPairs _),
    "q_minhash_pairs" -> (minHashPairs _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_simhash" -> (simHashFingerprints _),
    "q_simhash_pairs" -> (simHashPairs _))

  val oracles: Map[String, String] = Map(
    "q_span_removal" -> spanRemovalSql,
    "q_duplicate_spans" -> duplicateSpansSql,
    "q_exact_dedup" -> exactDedupSql,
    "q_near_dup_pairs" -> nearDupPairsSql,
    "q_near_dup_pairs_capped" -> nearDupPairsCappedSql,
    "q_jaccard_prefix_pairs" -> nearDupPairsSql,
    "q_minhash_pairs" -> minHashPairsSql,
    "q_simhash_pairs" -> simHashPairsSqlOf(rotations = 8, window = 4, maxHamming = 3),
    "q_dedup_clusters" -> dedupClustersSql,
    "q_simhash" -> simHashSql)
}
