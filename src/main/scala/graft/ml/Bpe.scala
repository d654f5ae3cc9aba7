package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Byte-pair encoding (the PUBLIC algorithm of Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units", and the
  * tokenizer family GPT-2 popularized): every real LLM pipeline budgets
  * documents in BPE tokens, not `\\S+` words — pre-training packs
  * sequences to a token budget, and a 2× miscount is a 2× waste of
  * context length. This module supplies the whole lifecycle:
  *
  *  - [[train]]: learn a ranked merge list from word frequencies — the
  *    classic algorithm (count adjacent symbol pairs weighted by word
  *    frequency, merge the most frequent pair, repeat). Training state is
  *    CONFIG-scale (the word-frequency table), so at corpus scale the
  *    counts are aggregated distributed ([[trainFromCorpus]]: one
  *    groupBy + a bounded top-`maxWords` collect) and the merge loop
  *    runs on the driver — the standard practice (vocabularies are built
  *    once from a sample, then frozen).
  *  - [[encodeWord]] / [[countTokens]]: apply merges greedily by rank
  *    (lowest-rank adjacent pair first — the published inference rule).
  *    Distributed application rides the batched-seam pattern
  *    ([[graft.operators.SentimentRunner]] precedent): the frozen merge
  *    list ships once per executor in the closure, a bounded per-partition
  *    memo cache collapses repeated words, and rows stream through
  *    `mapPartitions` without whole-partition buffering.
  *
  * Word segmentation before BPE uses a GPT-2-style pre-tokenizer regex
  * (letter runs, digit runs, punctuation runs, each with optional leading
  * space); symbols are characters plus the Sennrich end-of-word marker
  * `</w>`, so "est" inside a word and "est" at word end learn separate
  * merges — the published behavior.
  */
object Bpe {

  /** End-of-word marker symbol (Sennrich et al. §3.2). */
  val EndOfWord = "</w>"

  /** GPT-2-style pre-tokenization: contractions ride with their word via
    * the leading-space alternates; letters, digits, and punctuation split
    * into separate runs.
    */
  private val preTokenRe =
    """ ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+""".r

  /** Split text into BPE pre-tokens (leading space kept with the token,
    * GPT-2 style, then trimmed for symbol purposes — this implementation
    * does not distinguish space-prefixed merges, keeping the vocab
    * fixture hand-checkable).
    */
  def preTokenize(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else preTokenRe.findAllIn(text).map(_.trim).filter(_.nonEmpty).toSeq

  private def toSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Learn `numMerges` ranked merges from word frequencies — the exact
    * published loop: repeatedly merge the most-frequent adjacent symbol
    * pair (ties broken lexicographically for determinism; the paper
    * leaves tie order unspecified, so the tiebreak is pinned here and in
    * the spec's goldens).
    */
  def train(wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Map[Vector[String], Long] =
      wordCounts.groupMapReduce { case (w, _) => toSymbols(w) } { case (_, c) => c }(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.groupMapReduce {
          case (syms, _) => mergePair(syms, best)
        } { case (_, c) => c }(_ + _)
        i += 1
      }
    }
    merges.toSeq
  }

  /** Word-frequency aggregation at corpus scale, then the driver-side
    * merge loop over the top `maxWords` words: one exchange on the word,
    * a bounded collect — the vocabulary is a config artifact, never
    * data-scale.
    */
  def trainFromCorpus(df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 65536): Seq[(String, String)] = {
    val counts = df.select(text.as("__t"))
      .select(explode(split(lower(col("__t")), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    train(counts, numMerges)
  }

  private def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += (pair._1 + pair._2)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Encode one word with a frozen merge list: repeatedly apply the
    * LOWEST-RANK adjacent pair present (the published inference order —
    * NOT left-to-right greedy, which diverges from training).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms = toSymbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** BPE token count of a text under a frozen merge list. */
  def countText(text: String, ranks: Map[(String, String), Int],
      cache: scala.collection.mutable.Map[String, Int] = null): Long = {
    var total = 0L
    preTokenize(if (text == null) "" else text.toLowerCase).foreach { w =>
      val n =
        if (cache == null) encodeWord(w, ranks).length
        else cache.getOrElseUpdate(w, encodeWord(w, ranks).length)
      total += n
    }
    total
  }

  /** Append a `bpe_tokens` column — the batched seam: merges ship once in
    * the closure (config-scale), one bounded LRU-ish memo per partition
    * collapses repeated words (natural-language corpora repeat words
    * constantly; the cache turns per-row cost into per-DISTINCT-word
    * cost), rows stream through without buffering.
    */
  def countTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], maxCacheWords: Int = 1 << 16): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("bpe_tokens", LongType, nullable = false))
    val ranks = merges.zipWithIndex.toMap
    df.mapPartitions { it =>
      val cache = new java.util.LinkedHashMap[String, Int](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Int]): Boolean =
          size() > maxCacheWords
      }
      import scala.jdk.CollectionConverters._
      val scalaCache: scala.collection.mutable.Map[String, Int] = cache.asScala
      it.map { r =>
        val t = if (r.isNullAt(idx)) null else r.getString(idx)
        Row.fromSeq(r.toSeq :+ countText(t, ranks, scalaCache))
      }
    }(Encoders.row(outSchema))
  }
}
