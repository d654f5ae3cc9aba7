package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curation

/** [[graft.operators.Curation]] + [[TextFunctions.redactPii]]: benchmark
  * decontamination, deterministic stratified sampling, repetition signals,
  * PII redaction.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------- decontamination

  private val benchDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "pack my box with five dozen liquor jugs right now")).toDF("id", "text")

  test("contaminationMarks flags exactly the docs sharing an n-gram, counts distinct shared shingles") {
    val corpus = Seq(
      // shares "the quick brown fox jumps" (and more) with bench 100
      (1L, "note the quick brown fox jumps over a fence"),
      // shares nothing 5-token long (words shuffled)
      (2L, "fox brown quick the jumps dog lazy over tonight the"),
      // shares "pack my box with five dozen liquor jugs" → 4 distinct 5-shingles
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "completely unrelated text about spark catalyst planning rules")).toDF("id", "text")
    val out = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text", n = 5)
      .orderBy($"id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq === Seq(
      (1L, true, 2L),  // "the quick brown fox jumps", "quick brown fox jumps over"
      (2L, false, 0L),
      (3L, true, 4L),
      (4L, false, 0L)))
  }

  test("contaminationMarks on a clean corpus returns all-false with zero counts") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val out = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text", n = 5)
      .collect()
    assert(out.length === 1 && !out(0).getBoolean(1) && out(0).getLong(2) === 0L)
  }

  test("contaminationMarksBloom equals the broadcast path, even with a saturated high-fpp sketch") {
    val corpus = Seq(
      (1L, "note the quick brown fox jumps over a fence"),
      (2L, "fox brown quick the jumps dog lazy over tonight the"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "completely unrelated text about spark catalyst planning rules")).toDF("id", "text")
    val want = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text", n = 5)
      .orderBy($"id").collect().toSeq
    // undersized filter at 30% fpp: plenty of false positives reach the
    // confirm join, which must remove every one of them
    val got = Curation.contaminationMarksBloom(corpus, $"id", $"text", benchDocs, $"text",
        n = 5, expectedShingles = 4L, fpp = 0.3)
      .orderBy($"id").collect().toSeq
    assert(got === want)
  }

  test("contaminationMarksBloom on a clean corpus marks nothing") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val out = Curation.contaminationMarksBloom(corpus, $"id", $"text", benchDocs, $"text", n = 5)
      .collect()
    assert(out.length === 1 && !out(0).getBoolean(1) && out(0).getLong(2) === 0L)
  }

  test("contaminationMarks respects n: a shared 4-gram is not a 13-gram hit") {
    // 4 shared tokens ("quick brown fox jumps") but no shared 5-gram
    val corpus = Seq((1L, "a quick brown fox jumps happily away")).toDF("id", "text")
    val hit4 = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text", n = 4)
      .head()
    val hit5 = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text", n = 5)
      .head()
    assert(hit4.getBoolean(1) && !hit5.getBoolean(1))
  }

  test("contaminationMarks at the n=13 production default: no false hits on short docs") {
    // every doc here is shorter than 13 tokens → zero shingles on both
    // sides → the empty-aggregate path must mark nothing and not error
    val corpus = Seq((1L, "short doc"), (2L, "another brief one")).toDF("id", "text")
    val out = Curation.contaminationMarks(corpus, $"id", $"text", benchDocs, $"text")
      .collect()
    assert(out.length === 2 && out.forall(r => !r.getBoolean(1) && r.getLong(2) == 0L))
  }

  // -------------------------------------------- stratified sampling

  test("stratifiedSample applies the default rate to null strata") {
    val df = spark.range(0, 400)
      .select($"id", when($"id" % 2 === 0, "en").otherwise(lit(null)).as("lang"))
    // en rate 0: every kept row must be a null-stratum row at default 1.0
    val kept = Curation.stratifiedSample(df, $"lang", $"id", Map("en" -> 0.0), 1.0)
      .collect()
    assert(kept.length === 200 && kept.forall(_.isNullAt(1)))
  }

  private def sampleDf = spark.range(0, 2000)
    .select($"id", (when($"id" % 4 === 0, "en").when($"id" % 4 === 1, "zh")
      .otherwise("other")).as("lang"))

  test("stratifiedSample is deterministic and stable under repartitioning") {
    val rates = Map("en" -> 0.3, "zh" -> 0.8)
    val a = Curation.stratifiedSample(sampleDf, $"lang", $"id", rates, 0.5)
      .select($"id").collect().map(_.getLong(0)).sorted
    val b = Curation.stratifiedSample(sampleDf.repartition(13), $"lang", $"id", rates, 0.5)
      .select($"id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("stratifiedSample hits each stratum's rate within binomial tolerance") {
    val rates = Map("en" -> 0.3, "zh" -> 0.8)
    val counts = Curation.stratifiedSample(sampleDf, $"lang", $"id", rates, 0.5)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata sizes: en 500, zh 500, other 1000; 4σ ≈ 4·√(n·p·(1−p))
    assert(math.abs(counts("en") - 150.0) < 4 * math.sqrt(500 * 0.3 * 0.7))
    assert(math.abs(counts("zh") - 400.0) < 4 * math.sqrt(500 * 0.8 * 0.2))
    assert(math.abs(counts("other") - 500.0) < 4 * math.sqrt(1000 * 0.25))
  }

  test("stratifiedSample at a lower rate is a subset of the same sample at a higher rate") {
    // monotone thresholds on the same hash → nested samples (the property
    // that lets a pipeline cheaply carve 1%/10%/100% corpus tiers)
    val lo = Curation.stratifiedSample(sampleDf, $"lang", $"id", Map.empty, 0.2)
      .select($"id").collect().map(_.getLong(0)).toSet
    val hi = Curation.stratifiedSample(sampleDf, $"lang", $"id", Map.empty, 0.6)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(lo.nonEmpty && lo.subsetOf(hi))
  }

  test("stratifiedSample rate 0 keeps nothing; rate 1 keeps everything") {
    assert(Curation.stratifiedSample(sampleDf, $"lang", $"id", Map.empty, 0.0).count() === 0L)
    assert(Curation.stratifiedSample(sampleDf, $"lang", $"id", Map.empty, 1.0).count() === 2000L)
  }

  test("rateThresholdHex is monotone; rate 1.0 is the above-all-hex sentinel") {
    val ts = Seq(0.0, 0.1, 0.25, 0.5, 0.9).map(Curation.rateThresholdHex)
    assert(ts.forall(_.matches("[0-9a-f]{8}")))
    assert(ts === ts.sorted)
    assert(Curation.rateThresholdHex(0.0) === "00000000")
    // "g" > every hex prefix lexicographically, so rate 1.0 keeps even the
    // key whose md5 prefix is exactly "ffffffff" (strict < would drop it
    // against a clamped hex threshold)
    assert(Curation.rateThresholdHex(1.0) === "g")
    assert(ts.forall(_ < Curation.rateThresholdHex(1.0)))
    assert("ffffffff" < Curation.rateThresholdHex(1.0))
  }

  // ------------------------------------------------ repetition signals

  test("dupNgramFrac: fully repetitive text scores high, distinct text scores 0") {
    val df = Seq(
      (1L, "spam spam spam spam spam"),         // 4 bigrams, 1 distinct → 0.75
      (2L, "all words here are different ok"),  // all bigrams distinct → 0.0
      (3L, "ab cd ab cd ab cd"),                // 5 bigrams, 2 distinct → 0.6
      (4L, "one"),                              // shorter than n → 0.0
      (5L, "")).toDF("id", "text")
      .select($"id", Curation.dupNgramFrac(graft.operators.Dedup.tokens($"text"), 2).as("f"))
      .orderBy($"id").collect().map(_.getDouble(1))
    assert(df(0) === 0.75 && df(1) === 0.0 && df(2) === 0.6 && df(3) === 0.0 && df(4) === 0.0)
  }

  test("dupNgramFrac at n=3 sees repeats the bigram view misses differently") {
    // "ab cd ab cd ab cd": trigrams = [ab cd ab, cd ab cd, ab cd ab, cd ab cd]
    // → 4 total, 2 distinct → 0.5
    val f = Seq((1L, "ab cd ab cd ab cd")).toDF("id", "text")
      .select(Curation.dupNgramFrac(graft.operators.Dedup.tokens($"text"), 3).as("f"))
      .head().getDouble(0)
    assert(f === 0.5)
  }

  // ------------------------------------------------- sequence packing

  test("packByTokenBudget respects the budget, packs contiguously, isolates oversized docs") {
    val docs = Seq(
      (1L, 800L), (2L, 800L), (3L, 800L), // 1+2 fit 2048, 3 spills
      (4L, 3000L),                        // alone over budget → own pack
      (5L, 100L), (6L, 100L)).toDF("doc_id", "nt")
    val out = Curation.packByTokenBudget(docs, $"doc_id", $"nt", budget = 2048, partitions = 1)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val packs = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    // every pack with more than one doc stays within budget
    out.groupBy(_._3).foreach { case (p, rows) =>
      if (rows.length > 1) assert(packs(p) <= 2048L, s"pack $p over budget: $packs")
    }
    // greedy first-fit in id order: [1,2], [3,4?]: 3 (800) then 4 (3000) exceeds → [3], [4], [5,6]
    assert(out.map(_._3).distinct.length === 4)
    assert(out.filter(_._1 <= 2L).map(_._3).distinct.length === 1) // 1,2 share
    assert(out.find(_._1 == 4L).get._3 !== out.find(_._1 == 3L).get._3) // 4 isolated
    // positions restart per pack and are contiguous in id order
    assert(out.find(_._1 == 1L).get._4 === 1)
    assert(out.find(_._1 == 2L).get._4 === 2)
    assert(out.find(_._1 == 5L).get._4 === 1)
  }

  test("packByTokenBudget is deterministic on skewed ids and pack ids never collide") {
    // 50k rows with a skewed id distribution — the regime where a
    // repartitionByRange formulation is NOT reproducible (RangePartitioner
    // seeds its boundary sample from the rdd id, so boundaries shift
    // between executions once partitions exceed the full-sample floor);
    // the exact-quantile range index must not care
    val docs = spark.range(0, 50000)
      .select(
        when($"id" < 45000, $"id").otherwise($"id" * 1000).as("doc_id"),
        ($"id" % 700 + 1).as("nt"))
    def run() = Curation.packByTokenBudget(docs, $"doc_id", $"nt", budget = 2048, partitions = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.sameElements(b), "pack assignment changed between identical executions")
    // every doc assigned exactly once; budget invariant holds globally
    assert(a.length === 50000 && a.map(_._1).distinct.length === 50000)
    // quantile boundaries keep the ranges CARDINALITY-balanced under this
    // skew — the min/max-interpolation formulation put 45k of 50k rows in
    // range 0 and serialized the packing pass on one task
    val perRange = a.groupBy(_._2 >> 32).view.mapValues(_.length)
    assert(perRange.size === 8, s"expected 8 populated ranges, got ${perRange.size}")
    perRange.foreach { case (r, n) =>
      assert(n >= 6000 && n <= 6500, s"range $r unbalanced: $n of 50000 rows")
    }
    val byPack = Curation.packByTokenBudget(docs, $"doc_id", $"nt", budget = 2048, partitions = 8)
      .groupBy($"pack_id").agg(sum($"n_tokens").as("s"), count(lit(1)).as("n"))
      .collect()
    byPack.foreach { r =>
      if (r.getLong(2) > 1) assert(r.getLong(1) <= 2048L, s"pack over budget: $r")
    }
  }

  test("packByTokenBudget bounded-state boundaries: deterministic, valid, balanced within a bucket") {
    // same skewed corpus as the exact-path test; the histogram path must
    // give the same GUARANTEES (pure function of the id multiset, budget
    // validity, no serializing mega-range) with O(1)-per-task state
    val docs = spark.range(0, 50000)
      .select(
        when($"id" < 45000, $"id").otherwise($"id" * 1000).as("doc_id"),
        ($"id" % 700 + 1).as("nt"))
    def run() = Curation.packByTokenBudget(docs, $"doc_id", $"nt",
      budget = 2048, partitions = 8, boundedStateBoundaries = true)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.sameElements(b), "bounded-state pack assignment changed between executions")
    assert(a.length === 50000 && a.map(_._1).distinct.length === 50000)
    // boundaries land on bucket edges: every range's cardinality is the
    // n/partitions target plus at most one bucket's mass — nothing close
    // to the 45k/50k mega-range the linear-interpolation scheme produced
    val perRange = a.groupBy(_._2 >> 32).view.mapValues(_.length)
    assert(perRange.size === 8, s"expected 8 populated ranges, got ${perRange.size}")
    assert(perRange.values.max <= 2 * 50000 / 8, s"range overshoot beyond a bucket: $perRange")
    val byPack = Curation.packByTokenBudget(docs, $"doc_id", $"nt",
      budget = 2048, partitions = 8, boundedStateBoundaries = true)
      .groupBy($"pack_id").agg(sum($"n_tokens").as("s"), count(lit(1)).as("n"))
      .collect()
    byPack.foreach { r =>
      if (r.getLong(2) > 1) assert(r.getLong(1) <= 2048L, s"pack over budget: $r")
    }
  }

  test("packByTokenBudget on empty input returns an empty frame with the contract schema") {
    val empty = spark.range(0).select($"id".as("doc_id"), $"id".as("nt"))
    val out = Curation.packByTokenBudget(empty, $"doc_id", $"nt", budget = 100, partitions = 4)
    assert(out.columns.toSeq === Seq("id", "n_tokens", "pack_id", "pack_pos"))
    assert(out.count() === 0L)
  }

  // --------------------------------------------------- PII redaction

  test("redactPii replaces emails, IPv4s, and phones; counts match patterns") {
    val out = Seq(
      "write to john.doe+spam@mail.example.org or call 555-123-4567 from 192.168.0.1",
      "no pii here at all",
      "two mails a@b.io c@d.co one ip 8.8.8.8").toDF("text")
      .select(TextFunctions.redactPii($"text").as("r"),
        regexp_count($"text", lit(TextFunctions.PiiEmailRe)).as("ne"),
        regexp_count($"text", lit(TextFunctions.PiiIpRe)).as("ni"),
        regexp_count($"text", lit(TextFunctions.PiiPhoneRe)).as("np"))
      .collect()
    assert(out(0).getString(0) === "write to [EMAIL] or call [PHONE] from [IP]")
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) === ((1, 1, 1)))
    assert(out(1).getString(0) === "no pii here at all")
    assert(out(2).getString(0) === "two mails [EMAIL] [EMAIL] one ip [IP]")
    assert((out(2).getInt(1), out(2).getInt(2), out(2).getInt(3)) === ((2, 1, 0)))
  }

  test("redactPii leaves nothing matching any PII pattern behind") {
    val left = Seq("a@b.io 10.0.0.1 555-000-1234 x@y.org 1.2.3.4").toDF("text")
      .select(TextFunctions.redactPii($"text").as("r"))
      .filter(col("r").rlike(TextFunctions.PiiEmailRe) ||
        col("r").rlike(TextFunctions.PiiIpRe) ||
        col("r").rlike(TextFunctions.PiiPhoneRe))
    assert(left.count() === 0L)
  }

  // ------------------------------------------------- segment dedup

  private def segRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getBoolean(4), r.getString(5)))

  test("segmentDedup: earliest (id, idx) occurrence wins globally, docs reassemble in order") {
    // seg size 2: doc 1 = [a b][c d], doc 2 = [c d][e f] (loses [c d] to
    // doc 1), doc 3 = [a b][a b][g h] (loses BOTH [a b]s — the first to
    // doc 1, the second to doc 1 too: within-doc repeats dedup as well)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "a b a b g h")).toDF("doc_id", "text")
    val out = segRows(Curation.segmentDedup(docs, $"doc_id", $"text",
      segTokens = 2, minKeepFrac = 0.5))
    // flags pin the threshold rule: 1/2 = 0.5 >= 0.5 kept; 1/3 < 0.5 dropped
    assert(out === Array(
      (1L, 2L, 2L, true, "a b c d"),
      (2L, 2L, 1L, true, "e f"),
      (3L, 3L, 1L, false, "g h")))
  }

  test("segmentDedup: a doc losing every segment survives as an empty flagged row") {
    val docs = Seq(
      (10L, "x y z w"),
      (20L, "x y z w")).toDF("doc_id", "text")
    val out = segRows(Curation.segmentDedup(docs, $"doc_id", $"text",
      segTokens = 2, minKeepFrac = 0.5))
    assert(out === Array(
      (10L, 2L, 2L, true, "x y z w"),
      (20L, 2L, 0L, false, "")))
  }

  test("segmentDedup: trailing partial segment dedups like any other; result is partitioning-invariant") {
    val docs = Seq(
      (1L, "p q r s t"),   // segs: [p q r][s t]
      (2L, "s t"),         // loses its only seg to doc 1's trailing partial
      (3L, "")).toDF("doc_id", "text") // empty doc: 0 segs, keep_frac 1
    val one = Curation.segmentDedup(docs.coalesce(1), $"doc_id", $"text",
      segTokens = 3, minKeepFrac = 0.5)
    val many = Curation.segmentDedup(docs.repartition(7), $"doc_id", $"text",
      segTokens = 3, minKeepFrac = 0.5)
    assert(segRows(one) === segRows(many))
    assert(segRows(one) === Array(
      (1L, 2L, 2L, true, "p q r s t"),
      (2L, 1L, 0L, false, ""),
      (3L, 0L, 0L, true, "")))
  }

  // ------------------------------------------------- dataset split

  test("splitColumn: disjoint, exhaustive, partitioning-invariant, and duplicate texts co-locate") {
    val docs = (0 until 400).map(i => (i.toLong, s"document body number ${i % 200}"))
      .toDF("id", "text") // every text appears exactly twice
    val assigned = docs.withColumn("split", Curation.splitColumn($"text"))
    val bySplit = assigned.groupBy($"split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySplit.values.sum === 400L)
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    // duplicates co-locate: each text maps to exactly one split
    assert(assigned.groupBy($"text")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count() === 0L)
    // content-addressed: repartitioning changes nothing
    val again = docs.repartition(13)
      .withColumn("split", Curation.splitColumn($"text"))
      .groupBy($"split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again === bySplit)
    // rough proportions: train should dominate at 80 %
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
  }

  test("splitColumn rejects invalid percentage combinations") {
    intercept[IllegalArgumentException] {
      Curation.splitColumn(lit("x"), trainPct = 90, valPct = 20)
    }
    intercept[IllegalArgumentException] {
      Curation.splitColumn(lit("x"), trainPct = -1, valPct = 5)
    }
  }

  test("weightedSample is deterministic and partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val a = Curation.weightedSample(df, $"id", $"w", k = 20)
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val b = Curation.weightedSample(df.repartition(13), $"id", $"w", k = 20)
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(a == b, "sample changed under repartitioning")
    assert(a.map(_._1) == (1 to 20), "rk not dense ascending")
    // priorities are ln(u)/w <= 0 and ranked descending
    assert(a.map(_._3) == a.map(_._3).sorted.reverse)
  }

  test("weightedSample inclusion tracks weights across salts (A-ES property)") {
    import spark.implicits._
    // two heavy items among 18 light ones: P(top-1 is heavy) =
    // (w_h1 + w_h2) / Σw = 18/36 = 0.5 per salt; across 120 independent
    // salts the heavy-top count concentrates near 60 (±3.3σ ≈ ±18)
    val df = (1L to 20L).map(i => (i, if (i <= 2) 9.0 else 1.0)).toDF("id", "w")
    val heavyTops = (0 until 120).count { s =>
      val top = Curation.weightedSample(df, $"id", $"w", k = 1, salt = s"salt$s")
        .select($"id").as[Long].head()
      top <= 2L
    }
    assert(heavyTops > 42 && heavyTops < 78,
      s"heavy items topped $heavyTops/120 samples; expected ~60 for weight share 0.5")
  }

  test("weightedSamplePerGroup draws an independent quota per stratum") {
    import spark.implicits._
    val df = (1L to 300L).map(i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", i, 1.0 + (i % 5)))
      .toDF("g", "id", "w")
    val got = Curation.weightedSamplePerGroup(df, $"g", $"id", $"w", kPerGroup = 7)
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // exactly 7 per group, rk dense, and priorities descend within a group
    for (g <- Seq("a", "b", "c")) {
      val rows = got.filter(_._2 == g).sortBy(_._1)
      assert(rows.map(_._1) == (1 to 7), s"group $g ranks: ${rows.map(_._1)}")
      assert(rows.map(_._4) == rows.map(_._4).sorted.reverse)
    }
    // a row's priority is group-independent: the same (id, w) under a
    // different grouping keeps its priority (pure function of salt:id)
    val regrouped = Curation.weightedSamplePerGroup(
        df.withColumn("g", lit("all")), $"g", $"id", $"w", kPerGroup = 300)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val direct = Curation.weightedSample(df, $"id", $"w", k = 300)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(regrouped == direct)
  }

  test("weightedSample throws on non-positive weight instead of skewing silently") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 0.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Curation.weightedSample(df, $"id", $"w", k = 2).collect()
    }
    assert(e.getMessage != null)
  }

  // ------------------------------------------------- temperatureMix

  private def mixCorpus = {
    import spark.implicits._
    // heavy head: 800 "en", mid 150 "id", tail 50 "su"
    ((1L to 800L).map((_, "en")) ++ (801L to 950L).map((_, "id")) ++
      (951L to 1000L).map((_, "su"))).toDF("doc_id", "lang")
  }

  test("temperatureMix alpha=1 keeps everything; alpha flattens the head") {
    import spark.implicits._
    val df = mixCorpus
    assert(Curation.temperatureMix(df, $"lang", $"doc_id", 1.0).count() == 1000L)
    val kept = Curation.temperatureMix(df, $"lang", $"doc_id", 0.3)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    // tail groups keep everything (rate clamps at 1); the head must
    // downsample toward the flattened mix
    assert(kept("su") == 50L && kept("id") == 150L)
    // closed form: rate_en = (p_en^α / Σ p^α) · tot / c_en
    val ps = Seq(0.8, 0.15, 0.05)
    val z = ps.map(math.pow(_, 0.3)).sum
    val rateEn = math.pow(0.8, 0.3) / z * 1000.0 / 800.0 // ≈ 0.6125
    val expectedEn = rateEn * 800.0
    val sigma = math.sqrt(800.0 * rateEn * (1 - rateEn)) // ≈ 13.8
    assert(math.abs(kept("en") - expectedEn) < 5 * sigma,
      s"head kept ${kept("en")}, expected ~$expectedEn ± ${5 * sigma}")
  }

  test("temperatureMix is deterministic, repartition-stable, monotone in alpha") {
    import spark.implicits._
    val df = mixCorpus
    def ids(alpha: Double, parts: Int) =
      Curation.temperatureMix(df.repartition(parts), $"lang", $"doc_id", alpha)
        .select($"doc_id").as[Long].collect().toSet
    val a = ids(0.5, 1)
    assert(a == ids(0.5, 7), "selection must not depend on partitioning")
    // lower alpha ⇒ lower head rate ⇒ head selection shrinks; the md5
    // threshold mechanism makes lower-rate selections SUBSETS
    val b = ids(0.3, 1)
    assert(b.subsetOf(a), "α=0.3 head selection must be a subset of α=0.5's")
    assert(b.size < a.size)
  }

  test("temperatureMix keeps null groups alive through the null-safe join") {
    import spark.implicits._
    val df = ((1L to 40L).map(i => (i, "en")) ++
      (41L to 50L).map(i => (i, null: String))).toDF("doc_id", "lang")
    val kept = Curation.temperatureMix(df, $"lang", $"doc_id", 1.0).count()
    assert(kept == 50L, "alpha=1 must keep every row incl. the null stratum")
  }

  // ------------------------------------------------- chunkPassages

  test("chunkPassages covers every token, overlaps by width-stride, reconstructs") {
    import spark.implicits._
    val text = (1 to 53).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text)).toDF("id", "text")
    val chunks = Curation.chunkPassages(df, $"id", $"text", width = 24, stride = 16)
      .orderBy($"chunk_id")
      .as[(Long, Int, Int, String)].collect().toSeq
    // ⌈53/16⌉ = 4 chunks; starts 0,16,32,48
    assert(chunks.map(_._2) == Seq(0, 1, 2, 3))
    assert(chunks.map(_._3) == Seq(24, 24, 21, 5))
    // consecutive chunks overlap by width − stride = 8 tokens
    val t0 = chunks(0)._4.split(" ")
    val t1 = chunks(1)._4.split(" ")
    assert(t0.takeRight(8).toSeq == t1.take(8).toSeq)
    // stride-prefixes + the last chunk reconstruct the document exactly
    val rebuilt = chunks.dropRight(1).flatMap(_._4.split(" ").take(16)) ++
      chunks.last._4.split(" ")
    assert(rebuilt.mkString(" ") == text)
  }

  test("chunkPassages: empty and short docs") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "just four small tokens"))
      .toDF("id", "text")
    val got = Curation.chunkPassages(df, $"id", $"text", width = 24, stride = 16)
      .as[(Long, Int, Int, String)].collect().toSeq.sortBy(_._1)
    // empty/whitespace docs yield NO chunks; a short doc yields one
    assert(got == Seq((3L, 0, 4, "just four small tokens")))
  }
}
