package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical and hybrid retrieval over a document corpus — the query-side
  * counterpart of the dedup/embedding pillars: BM25 term scoring
  * (Robertson & Zaragoza, "The Probabilistic Relevance Framework: BM25
  * and Beyond", FnTIR 2009; the idf form is Lucene's non-negative
  * `ln(1 + (N − df + 0.5)/(df + 0.5))`) and reciprocal rank fusion
  * (Cormack, Clarke & Buettcher, SIGIR'09) for combining a lexical arm
  * with an embedding-neighbor arm — the standard first stage of a
  * RAG / retrieval pipeline.
  *
  * Reference tie-in: the reference ranks tweets per topic by engagement
  * counts (utils.py top-N selection); these operators generalize that
  * "rank documents for a query" surface to scored lexical retrieval.
  *
  * Cross-engine float discipline (the q_tfidf_terms rules): `ln` is the
  * one non-bit-portable operation, so scores round to 6 decimals BEFORE
  * ranking and ties break on doc id. Per-term contributions are summed
  * as explicit left-associated column additions (one column per query
  * term — queries are short by construction), never a float SUM
  * aggregation whose fold order the partitioning would pick.
  */
object Retrieval {

  /** Terms: lowercase alphanumeric runs of >= 3 chars — the
    * [[graft.queries.TextQueries]] tokenizer, kept identical so lexical
    * retrieval and TF-IDF agree on the vocabulary.
    */
  val TermRegex = "[a-z0-9]{3,}"

  /** Top-k documents for `queryTerms` under BM25.
    *
    * Output: (rk, doc_id, bm25), rk 1..k by (bm25 DESC, doc_id), score
    * rounded to 6. Documents containing none of the query terms are not
    * candidates (their score is identically 0 — the retrieval
    * convention, and it keeps the candidate set df-bounded).
    *
    * Scale shape: dl (document length) is a zero-shuffle `size()`
    * projection; tf touches only tokens IN THE QUERY (the explode is
    * filtered before the exchange, so the shuffled grain is
    * candidate-docs × query-terms, not the token stream); df and the
    * corpus stats arrive as a broadcast 1-row cross join; the final
    * top-k is TakeOrdered (orderBy.limit — per-partition heaps, never a
    * global sort), with rk assigned over the k survivors only.
    *
    * Block retention: each invocation checkpoints a size-gated scratch
    * (the narrow projection below) whose localCheckpoint blocks live
    * until the driver GC runs the ContextCleaner — the RETURNED frame
    * still consumes them, so the operator cannot release eagerly. A
    * long-lived session issuing many ad-hoc BM25 calls holds one gated
    * block set per in-flight result; drop references to returned frames
    * (or lower the scratch gate) if that footprint matters.
    */
  def bm25TopK(
      docs: DataFrame, id: Column, text: Column,
      queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(queryTerms.distinct == queryTerms,
      s"bm25TopK: duplicate query terms in ${queryTerms.mkString(",")}")
    // r17: ONE tokenize pass. The previous shape re-ran the corpus regex
    // for each of its three consumers (dl for the stats aggregate, the
    // tf explode, and the dl side of the tf⋈dl join). The narrow
    // projection — (doc, length, query-term hits) at ~a few dozen bytes
    // per row, the text and the full token array both dropped — feeds
    // every consumer, checkpointed under the scratch size gate; dl now
    // rides the tf aggregate (max of the per-doc constant), so the
    // tf⋈dl join is gone outright.
    val narrow = Checkpoints.materializeScratch(
      docs.select(id.as("__did"),
          regexp_extract_all(lower(text), lit(TermRegex), lit(0)).as("__toks"))
        .select(col("__did"), size(col("__toks")).as("__dl"),
          filter(col("__toks"),
            t => t.isInCollection(queryTerms)).as("__qtoks")))
    // corpus stats: one 2-column row, broadcast — avgdl = Σdl / N as a
    // single double division (identical expression on the oracle side)
    val stats = narrow.agg(count(lit(1)).as("__n"),
      sum(col("__dl")).cast("long").as("__tot"))
    // token stream already filtered to query terms BEFORE the explode
    val tf = narrow
      .select(col("__did"), col("__dl"), explode(col("__qtoks")).as("__term"))
      .groupBy(col("__did"), col("__term"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    val df = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    scoreAndRank(tf, df, stats, queryTerms, k1, b, k)
  }

  /** The shared BM25 scoring tail: per-(doc, term) (tf, dl) × per-term
    * df × broadcast (n, tot) → pivoted fixed-order fold → TakeOrdered
    * top-k. `tf` carries `__dl` alongside `__tf` (the ad-hoc path joins
    * it on; the indexed path reads it straight off the posting row).
    * One arithmetic for both paths, so the shared-oracle gate compares
    * like with like.
    */
  private def scoreAndRank(
      tf: DataFrame, df: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k1: Double, b: Double, k: Int): DataFrame = {
    val contrib = tf.join(broadcast(df), Seq("__term"))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("__tot").cast("double") / col("__n").cast("double"))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5))))
      .withColumn("__c",
        col("__idf") * (col("__tf").cast("double") * lit(k1 + 1.0)) /
          (col("__tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / col("__avgdl"))))
    // one column per query term (max of a singleton is exact), summed
    // left-to-right in QUERY ORDER — fold order is part of the contract
    val pivoted = contrib.groupBy(col("__did"))
      .agg(
        max(when(col("__term") === queryTerms.head, col("__c"))).as("__c0"),
        queryTerms.tail.zipWithIndex.map { case (t, i) =>
          max(when(col("__term") === t, col("__c"))).as(s"__c${i + 1}")
        }: _*)
    val score = queryTerms.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    val top = pivoted
      .select(col("__did").as("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("bm25"))
  }

  /** PERSISTENT BM25 index — the serving shape of [[bm25TopK]]. The
    * ad-hoc form tokenizes the corpus at query time (four passes: tf,
    * df, dl, stats); at 100 TB that is four corpus scans PER QUERY for
    * statistics that are query-independent. [[buildIndex]] pays the
    * tokenize once and stores:
    *
    *  - `postings/batch=N/bucket=B/` — (term, doc_id, tf, dl),
    *    term-BUCKETED by `pmod(xxhash64(term), buckets)` so a query's
    *    terms resolve to a static partition filter (the
    *    [[IvfIndex.probe]] cell-prune discipline: the parquet reader
    *    lists only the query's buckets, never the vocabulary),
    *    batch-partitioned for [[appendIndex]]. Document LENGTH is
    *    DENORMALIZED into the posting row (the Lucene norms shape): a
    *    separate `dl/` tree is one row per document EVER indexed, and
    *    joining it per query is a corpus-scale scan that grows with the
    *    index, not with the query — the round-10 serving measurement
    *    attributed most of the query latency to exactly that join. The
    *    repeat costs ~8 bytes per posting before parquet RLE; the query
    *    touches only pruned posting pages. Document frequency is NOT
    *    stored: df(term) is exactly the row count of that term's
    *    postings, which the query's pruned read already touches in
    *    full — a separate tdf tree would be a per-batch write and a
    *    compaction surface for data the query derives for free.
    *  - `stats/batch=N/` — one (n, tot) row per batch (additive;
    *    [[queryIndex]] sums).
    *
    * [[queryIndex]] then scores a query with NO corpus access: filtered
    * posting pages × df × broadcast stats, the same pivoted fixed-order
    * fold as [[bm25TopK]] — registered against the SAME oracle SQL
    * (q_bm25_indexed vs q_bm25), so the index must change cost only,
    * never the answer.
    */
  def buildIndex(
      docs: DataFrame, id: Column, text: Column, path: String,
      buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buildIndex: buckets must be >= 1, got $buckets")
    val spark = docs.sparkSession
    // a fresh build owns the whole tree: clear batches from a previous
    // index generation (the IvfIndex.build discipline)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // meta FIRST (it is layout config, not a commit marker — the
    // ensureIndexMeta ordering): a crash between the two writes leaves
    // meta-without-batches, which appendIndex accepts (it reads meta and
    // lands its batch — the streaming recovery path). The reverse order
    // left batches-without-meta, which bricked BOTH appendIndex and
    // queryIndex until a full rebuild. queryIndex on the meta-only tree
    // still raises on the missing postings path — a crashed ONE-SHOT
    // build is re-run, that is its recovery; the ordering exists for the
    // append path.
    spark.createDataFrame(Seq(Tuple1(buckets))).toDF("buckets")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    writeBatch(docs, id, text, path, buckets, batchId = 0L)
  }

  /** Incremental APPEND — the crawl-batch shape the other persistent
    * stores already have ([[graft.operators.IvfIndex.append]],
    * [[graft.operators.IncrementalDedup]]): tokenize and land ONLY the
    * new documents as their own `batch=` partitions under postings /
    * stats. Corpus-level statistics (df per term, N, total
    * dl) are additive across disjoint doc sets, so [[queryIndex]] merges
    * them at query time with a per-term sum over matching batches —
    * results are IDENTICAL to a full rebuild over the union
    * (RetrievalSpec pins bit-for-bit equality), and arrival cost is one
    * tokenize pass over the new batch only. Replaying a batchId
    * overwrites its own partitions (idempotent); doc ids must be unique
    * across all batches ever fed to one index.
    */
  def appendIndex(
      docs: DataFrame, id: Column, text: Column, path: String,
      batchId: Long): Unit = {
    require(batchId >= 0L, s"appendIndex: batchId must be >= 0, got $batchId")
    val spark = docs.sparkSession
    // adopt BEFORE writing: landing a fresh batch dir would make a
    // half-swapped tree look live and orphan the consolidated history
    // still sitting at __next
    adoptIndexTrees(spark, path)
    val buckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    writeBatch(docs, id, text, path, buckets, batchId)
  }

  /** Write the layout meta if absent — the streaming entry point: a
    * stream feeds EVERY batch (including the first) through
    * [[appendIndex]], so there is no one-shot [[buildIndex]] call to
    * record the bucket count. Idempotent; a crash between meta and the
    * first batch's write replays into the same state.
    */
  def ensureIndexMeta(
      spark: SparkSession, path: String, buckets: Int): Unit = {
    require(buckets >= 1, s"ensureIndexMeta: buckets must be >= 1, got $buckets")
    val meta = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) {
      spark.createDataFrame(Seq(Tuple1(buckets))).toDF("buckets")
        .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    } else {
      val existing = spark.read.parquet(s"$path/meta").head().getInt(0)
      require(existing == buckets,
        s"ensureIndexMeta: index at $path has $existing buckets, asked for $buckets")
    }
  }

  private def writeBatch(
      docs: DataFrame, id: Column, text: Column, path: String,
      buckets: Int, batchId: Long): Unit = {
    val base = docs.select(id.as("doc_id"),
      regexp_extract_all(lower(text), lit(TermRegex), lit(0)).as("__toks"))
      .withColumn("dl", size(col("__toks")))
    // postings FIRST, stats LAST: the committed stats dir (its job-commit
    // _SUCCESS marker) is the batch's COMMIT RECORD. [[queryIndex]] pins
    // its snapshot to the committed-stats batch set, so under a
    // CONCURRENT append a batch becomes visible atomically and only
    // after its postings are fully landed — the reverse order exposed a
    // torn read (stats counted into N/avgdl while the batch's postings
    // were still writing), an answer equal to NO quiesced index.
    // dl rides the posting row (grouped by — it is functionally
    // dependent on doc_id, so the key cardinality is unchanged)
    base.select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets)))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/batch=$batchId")
    base.agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("tot"))
      .write.mode("overwrite").parquet(s"$path/stats/batch=$batchId")
  }

  private val IndexTrees = Seq("postings", "stats")

  /** Consolidate every `batch=` partition with id <= `upToBatch` across
    * the two index subtrees (postings / stats) — the
    * [[IncrementalDedup.compactStore]] small-files discipline, with one
    * index-specific merge: stats consolidate to a single additive row.
    * Posting bucket partitioning is preserved, so the bucket-prune
    * contract survives compaction. Same SAFETY CONTRACT as
    * every store: only compact batch ids the stream's checkpoint has
    * committed past. Crash-safe via the `__next` + adopt-on-read swap
    * ([[queryIndex]] and [[appendIndex]] self-heal).
    */
  def compactIndex(
      spark: SparkSession, path: String, upToBatch: Long): Unit = {
    // PRE-FLIGHT: both trees must resolve the SAME batch-id set, hence
    // the same consolidation target. [[BatchStore.compactPrepare]]
    // computes each tree's target independently (max existing id <=
    // upToBatch per tree); if the sets ever diverge — a crashed
    // writeBatch landed postings batch=N without its stats commit
    // record, and compaction ran before the stream's replay overwrote
    // batch=N — the consolidated stats would pin ids whose postings
    // paths no longer exist and every queryIndex read would fail
    // PERSISTENTLY (servingRead retries cannot heal a wrong layout).
    // Fail loudly here instead, pointing at the replay contract.
    locally {
      // scope the check to ids <= upToBatch — the set this compaction
      // actually consolidates. A torn batch ABOVE the compaction range
      // (stream died before replaying it) is outside this run's blast
      // radius: blocking consolidation of older fully-committed batches
      // on it would make one dead stream permanently freeze maintenance.
      val pIds = {
        val (fs, p) = BatchStore.fsPath(spark, s"$path/postings")
        BatchStore.listBatches(fs, p).map(_._1).filter(_ <= upToBatch).toSet
      }
      val sIds = {
        val (fs, p) = BatchStore.fsPath(spark, s"$path/stats")
        BatchStore.listBatches(fs, p).map(_._1).filter(_ <= upToBatch).toSet
      }
      require(pIds == sIds,
        s"compactIndex: postings/stats batch-id sets diverge at $path " +
          s"(postings-only ${(pIds -- sIds).toSeq.sorted.mkString(",")}; " +
          s"stats-only ${(sIds -- pIds).toSeq.sorted.mkString(",")}) — a " +
          "crashed writeBatch left a torn append; let the stream's " +
          "checkpoint replay overwrite that batch id (the foreachBatch " +
          "replay contract) before compacting")
    }
    // both trees ride [[BatchStore.compactPrepare]] (the single-sourced
    // swap + largest-existing-id discipline); postings keep their bucket
    // partitioning so the bucket-prune contract survives, and stats
    // consolidate to one additive row. STAGE both replacement trees
    // fully, then swap back-to-back: a concurrent [[queryIndex]] pins
    // one committed-batch snapshot across both trees, and the only
    // window in which its pin can straddle the swap is the two renames —
    // a straddled pin fails loudly on a missing explicit path (never a
    // torn answer) and the serving retry re-pins.
    val postings = BatchStore.compactPrepare(spark, s"$path/postings",
      upToBatch, partitionCols = Seq("bucket"))
    val stats = BatchStore.compactPrepare(spark, s"$path/stats", upToBatch,
      targetFiles = 1,
      merge = d => d.agg(sum(col("n")).as("n"),
        sum(col("tot")).cast("long").as("tot")))
    postings.foreach(BatchStore.completeSwap)
    stats.foreach(BatchStore.completeSwap)
  }

  /** Self-heal a crashed [[compactIndex]] swap before any read. */
  private def adoptIndexTrees(spark: SparkSession, path: String): Unit = {
    IndexTrees.foreach { sub =>
      val (fs, p) = BatchStore.fsPath(spark, s"$path/$sub")
      BatchStore.adoptNext(fs, p)
    }
  }

  /** Top-k BM25 against a [[buildIndex]] store — identical output
    * contract and arithmetic to [[bm25TopK]], zero corpus scans: only
    * the query terms' posting/df buckets are listed and read (static
    * partition filter, spec-asserted).
    *
    * CONCURRENT SERVING: safe to run while a (single) maintenance thread
    * appends and compacts the same index — the frame is planned against
    * a pinned committed-batch snapshot (see below), so every answer
    * equals some quiesced index state (ServingConcurrencySpec pins the
    * interleavings). A compaction swap completing mid-execution fails
    * the read loudly rather than tearing it; execute under
    * [[BatchStore.servingRead]] to absorb that as a re-pinned retry.
    */
  def queryIndex(
      spark: SparkSession, path: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryIndex: empty query")
    require(queryTerms.distinct == queryTerms,
      s"queryIndex: duplicate query terms in ${queryTerms.mkString(",")}")
    adoptIndexTrees(spark, path)
    val buckets = spark.read.parquet(s"$path/meta").head().getInt(0)
    // SNAPSHOT PIN: resolve the committed batch set ONCE (from the stats
    // tree — the commit record, see [[writeBatch]]) and read BOTH trees
    // through those explicit paths. Listing each tree independently
    // would let a concurrent append or compact land between the two
    // reads, scoring one tree's batches against the other's — N/avgdl
    // from a batch whose postings aren't counted, an answer no quiesced
    // index returns. With the pin, a concurrent maintenance swap can
    // only invalidate a pinned path and fail loudly (PATH_NOT_FOUND /
    // vanished file), which [[BatchStore.servingRead]] retries.
    val (sfs, statsRoot) = BatchStore.fsPath(spark, s"$path/stats")
    val committed = BatchStore.committedBatches(sfs, statsRoot)
      .map(_._1).sorted
    require(committed.nonEmpty, s"queryIndex: no committed batches at $path")
    val neededBuckets = {
      // derive the buckets with ONE tiny Spark job over the literal terms
      // (xxhash64's exact seed/variant is an engine internal — never
      // reimplement it driver-side)
      import spark.implicits._
      queryTerms.toDF("term")
        .select(pmod(xxhash64(col("term")), lit(buckets)).as("b"))
        .distinct().as[Long].collect().toIndexedSeq.sorted
    }
    // postings/stats live under batch= partitions (append-many);
    // N/total-dl are additive over the disjoint batch doc sets (one-row
    // sum); df(term) is the row count of the term's pruned postings —
    // derived from the same filtered read the scoring needs anyway; dl
    // rides the posting row, so the query touches NOTHING that scales
    // with the corpus — only the query terms' pruned posting pages of
    // the pinned batches
    val tf = spark.read.option("basePath", s"$path/postings")
      .parquet(committed.map(b => s"$path/postings/batch=$b"): _*)
      .filter(col("bucket").isin(neededBuckets.toIndexedSeq: _*))
      .filter(col("term").isin(queryTerms: _*))
      .select(col("term").as("__term"), col("doc_id").as("__did"),
        col("tf").as("__tf"), col("dl").as("__dl"))
    val df = tf.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"))
    val stats = spark.read.option("basePath", s"$path/stats")
      .parquet(committed.map(b => s"$path/stats/batch=$b"): _*)
      .agg(sum(col("n")).as("__n"), sum(col("tot")).as("__tot"))
    scoreAndRank(tf, df, stats, queryTerms, k1, b, k)
  }

  /** Cross-encoder scoring contract for [[rerank]] — one score per
    * (query, doc) pair, one scorer instance per partition (the
    * [[SentimentClassifier]] batching discipline). An exported
    * cross-encoder runs here through
    * [[graft.ml.MiniOnnxSentimentClassifier]]-style MiniOnnx plumbing or
    * the reflective ONNX Runtime binding; RetrievalSpec drives a REAL
    * `.onnx` scorer end-to-end.
    */
  trait RerankScorer extends Serializable {
    def scoreBatch(query: String, texts: Seq[String]): Seq[Double]
  }

  /** Retrieve-then-rerank, stage two: re-score the first stage's
    * CANDIDATES (a top-k frame from [[bm25TopK]] / [[queryIndex]] /
    * [[reciprocalRankFusion]], joined back to text) with a batched
    * model and return the top `k` by (score DESC, doc_id). The
    * first-stage candidate set is small by construction (tens to
    * hundreds of docs), which is exactly what makes an expensive
    * cross-encoder affordable — the model never sees the corpus, only
    * the candidates (the standard two-stage RAG ranking argument).
    *
    * Scale shape: one `mapPartitions` over the candidate frame
    * (batches of `batchSize`, one scorer instance per partition, no
    * per-row dispatch), then TakeOrdered top-k. Scores round to 6
    * before ranking with doc-id tie-break (the module's cross-engine
    * float discipline), and must be independent of the partition split
    * (spec-asserted).
    */
  def rerank(
      candidates: DataFrame, id: Column, text: Column, query: String,
      scorer: RerankScorer, batchSize: Int = 32, k: Int = 10): DataFrame = {
    require(batchSize >= 1, s"rerank: batchSize must be >= 1, got $batchSize")
    // null text must not reach the scorer: scoreBatch implementations
    // tokenize, and a null from getString NPEs deep inside mapPartitions
    val base = candidates.select(id.cast("long").as("doc_id"),
      coalesce(text.cast("string"), lit("")).as("__text"))
    val scored = base.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = scorer.scoreBatch(query, batch.map(_.getString(1)))
        require(scores.length == batch.length,
          s"rerank scorer returned ${scores.length} scores for ${batch.length} texts")
        batch.lazyZip(scores).map { case (r, s) => Row(r.getLong(0), s) }
      }
    }(Encoders.row(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))))
    val top = scored
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("score"))
  }

  /** Reciprocal rank fusion of ranked arms: each arm is (doc_id, rk) and
    * contributes `1 / (rrfK + rk)` for documents it ranked; fused score
    * is the left-associated sum over arms IN THE GIVEN ORDER (coalesce 0
    * for arms that missed the doc), rounded to 6, top-k by
    * (rrf DESC, doc_id).
    *
    * The arithmetic is exact rational work on small integers — the same
    * doubles on any engine — so the fusion layer adds NO float
    * portability caveat beyond what the arms themselves carry.
    */
  def reciprocalRankFusion(
      arms: Seq[DataFrame], rrfK: Int = 60, k: Int = 20): DataFrame = {
    require(arms.nonEmpty, "reciprocalRankFusion: no arms")
    val named = arms.zipWithIndex.map { case (a, i) =>
      a.select(col("doc_id"), col("rk").as(s"__rk$i"))
    }
    val joined = named.reduce((l, r) => l.join(r, Seq("doc_id"), "full_outer"))
    val score = arms.indices.map(i =>
      coalesce(lit(1.0) / (lit(rrfK).cast("double") + col(s"__rk$i").cast("double")),
        lit(0.0)))
      .reduce(_ + _)
    val top = joined.select(col("doc_id"), round(score, 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("rk"), col("doc_id"), col("rrf"))
  }
}
