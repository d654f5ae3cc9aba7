package graft

import org.apache.spark.sql.functions._

import graft.ml.Bpe
import graft.operators.Curation

/** [[Bpe]] — goldens are HAND-DERIVED from the published algorithm on the
  * Sennrich et al. (2016) worked example corpus
  * {low×5, lower×2, newest×6, widest×3}; every merge below is the
  * frequency-then-lexicographic choice computed by hand, and "lowest"
  * segmenting to [low, est</w>] is the paper's own generalization
  * showcase.
  */
class BpeSpec extends SparkSpec {

  private val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  // hand-derived: pair counts of round 1 put (e,s)/(s,t)/(t,</w>) at 9,
  // lexicographic tiebreak picks (e,s); and so on
  private val expectedMerges = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"))

  test("train reproduces the hand-computed merge sequence") {
    assert(Bpe.train(corpus, 8) == expectedMerges)
    // prefix property: fewer merges = the same sequence truncated
    assert(Bpe.train(corpus, 3) == expectedMerges.take(3))
  }

  test("encodeWord applies merges by rank — the paper's generalization") {
    val ranks = expectedMerges.zipWithIndex.toMap
    assert(Bpe.encodeWord("newest", ranks) == Seq("newest</w>"))
    assert(Bpe.encodeWord("lowest", ranks) == Seq("low", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) == Seq("low", "</w>"))
    // no applicable merge: pure character fallback + end marker
    assert(Bpe.encodeWord("wider", ranks) ==
      Seq("w", "i", "d", "e", "r", "</w>"))
  }

  test("countText pre-tokenizes GPT-2 style and sums subword counts") {
    val ranks = expectedMerges.zipWithIndex.toMap
    assert(Bpe.countText("newest lowest", ranks) == 1L + 2L)
    // punctuation is its own pre-token: low(2) ,(2) low(2)
    assert(Bpe.countText("low, low", ranks) == 6L)
    assert(Bpe.countText("", ranks) == 0L && Bpe.countText(null, ranks) == 0L)
    // case-insensitive: NEWEST encodes like newest
    assert(Bpe.countText("NEWEST", ranks) == 1L)
  }

  test("distributed countTokens equals the driver-side count, any partitioning") {
    import spark.implicits._
    val ranks = expectedMerges.zipWithIndex.toMap
    val texts = Seq(
      (1L, "the newest lowest widest"), (2L, "low lower, newest!"),
      (3L, ""), (4L, null: String), (5L, "newest newest newest"))
    val df = texts.toDF("id", "text")
    def run(parts: Int) = Bpe.countTokens(df.repartition(parts), "text", expectedMerges)
      .select($"id", $"bpe_tokens").as[(Long, Long)].collect().toMap
    val got = run(1)
    assert(run(7) == got)
    texts.foreach { case (id, t) =>
      assert(got(id) == Bpe.countText(t, ranks), s"row $id")
    }
  }

  test("trainFromCorpus aggregates word counts distributed, then trains") {
    import spark.implicits._
    val rows = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val df = rows.toDF("id", "text").repartition(5)
    assert(Bpe.trainFromCorpus(df, $"text", 8) == expectedMerges)
  }

  test("trainFromCorpus maxWords caps the driver-side vocabulary collect") {
    // the per-operator driver-state cap discipline (Quantiles.maxGroups,
    // NaiveBayes.maxClasses): the word-frequency collect is limit()ed to
    // the top maxWords by (count desc, word asc), so a heavy-tailed
    // corpus cannot materialize its whole vocabulary on the driver. With
    // maxWords = 2, only {newest ×6, low ×5} survive: the merges that
    // existed only because of 'lower'/'widest' mass must vanish, and the
    // result equals training on the truncated count map directly.
    import spark.implicits._
    val rows = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val df = rows.toDF("id", "text").repartition(5)
    val capped = Bpe.trainFromCorpus(df, $"text", 8, maxWords = 2)
    assert(capped == Bpe.train(Map("newest" -> 6L, "low" -> 5L), 8))
    assert(capped != expectedMerges)
  }

  test("documents fixture is BMP-only (the BPE oracle's codepoint/code-unit equivalence)") {
    // The DuckDB oracle splits words into symbols by CODEPOINT while
    // Bpe.toSymbols maps UTF-16 CODE UNITS — equivalent exactly when no
    // supplementary-plane character (surrogate pair) appears in the
    // corpus. Pin that assumption against the real fixture at both test
    // SFs: if astral text ever enters documents.parquet, this fails loud
    // and toSymbols must switch to codepoint segmentation.
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val astral = Tables(spark, s"/root/testdata/$sf", "documents")
        .filter(regexp_like(col("text"), lit("[\\x{10000}-\\x{10FFFF}]")))
        .count()
      assert(astral == 0L,
        s"$sf: $astral documents carry supplementary-plane characters — " +
          "the BPE DuckDB oracle's symbol split no longer matches toSymbols")
    }
  }

  test("BPE counts feed packByTokenBudget: budgets hold in BPE tokens") {
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      (i.toLong, Seq.fill(i % 7 + 1)("newest lowest").mkString(" "))
    }.toDF("doc_id", "text")
    val counted = Bpe.countTokens(docs, "text", expectedMerges)
    val packed = Curation.packByTokenBudget(
      counted, $"doc_id", $"bpe_tokens", budget = 40L, partitions = 4)
    val perPack = packed.groupBy($"pack_id").agg(sum($"n_tokens").as("t"))
      .as[(Long, Long)].collect()
    assert(perPack.nonEmpty)
    // every pack respects the budget except single oversize docs (none
    // here: max doc = 7*3 = 21 < 40)
    perPack.foreach { case (p, t) => assert(t <= 40L, s"pack $p: $t > 40") }
    // all docs packed exactly once
    assert(packed.select($"id").distinct().count() == 60)
  }
}
