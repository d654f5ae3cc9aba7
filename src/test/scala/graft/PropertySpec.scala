package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Property tests over the cleaning and dedup invariants (SURVEY §5):
  * whatever the input text, cleaning output carries no URLs/mentions and is
  * lowercase; exact dedup is idempotent and keeps one row per key; jaccard
  * is symmetric and bounded. ScalaCheck generators sampled under fixed
  * seeds (the scalatest-scalacheck bridge isn't on the classpath; seeded
  * sampling keeps runs deterministic anyway).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 20)(check: A => Unit): Unit = {
    val ss = samples(g, n)
    assert(ss.nonEmpty)
    ss.foreach(check)
  }

  private val word = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("http://x.co/abc"),
    Gen.const("@user"),
    Gen.const("#tag"),
    Gen.const("Jakarta"),
    Gen.const("\tweird\nspace "))
  private val textGen: Gen[String] =
    Gen.listOfN(12, word).map(_.mkString(" "))

  test("cleaning invariants hold for arbitrary noisy text") {
    import spark.implicits._
    val texts = samples(textGen, 60)
    val cleaned = texts.toDF("t")
      .select(TextFunctions.cleanTweetText(col("t"))).as[String].collect()
    assert(cleaned.length == texts.length)
    cleaned.foreach { c =>
      assert(!c.contains("http") && !c.contains("www"))
      assert(!c.exists(_.isUpper))
      assert(!c.matches(".*@\\w+.*"))
      assert(!c.contains("  ") && c == c.trim) // whitespace collapsed
    }
  }

  test("exact dedup keeps exactly one row per key and is idempotent") {
    import spark.implicits._
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 10L), Gen.alphaStr.map(_.take(5)))), 10) {
      rows =>
        val df = rows.toDF("k", "v")
        val once = Dedup.exact(df, col("k"), col("v"))
        val twice = Dedup.exact(once, col("k"), col("v"))
        val keys = once.select("k").as[Long].collect().toSeq
        assert(keys.distinct.size == keys.size)               // unique keys
        assert(keys.toSet == rows.map(_._1).toSet)            // no key lost
        assert(twice.collect().toSet == once.collect().toSet) // idempotent
    }
  }

  test("partialRatioSim is symmetric, bounded, exact on substrings") {
    import spark.implicits._
    import graft.operators.FuzzyLocator.partialRatioSim
    val s = Gen.alphaLowerStr.map(_.take(12))
    val pairs = samples(Gen.zip(s, s), 40)
    val got = pairs.toDF("a", "b").select(
      partialRatioSim(col("a"), col("b")).as("ab"),
      partialRatioSim(col("b"), col("a")).as("ba"),
      partialRatioSim(col("a"), concat(lit("xx"), col("a"), lit("yy"))).as("sub"),
      length(col("a")).as("la"), length(col("b")).as("lb"))
      .collect()
    got.foreach { r =>
      // the shorter/longer swap makes argument order irrelevant whenever
      // lengths differ (equal-length pairs sweep each other's m±1 windows,
      // which is legitimately direction-dependent)
      if (r.getInt(3) != r.getInt(4)) assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      // embedded as a literal substring -> a window matches exactly
      assert(if (r.getInt(3) == 0) r.getDouble(2) == 0.0 else r.getDouble(2) == 1.0)
    }
  }

  test("native PartialRatioSimExpr is bit-identical to the HOF formulation") {
    import spark.implicits._
    import graft.functions.PartialRatio
    import graft.operators.FuzzyLocator.partialRatioSim
    // words with shared fragments so windows actually differ in score,
    // plus empties and length extremes
    val frag = Gen.oneOf("jakarta", "bandung", "ban", "xx", "", "selatan")
    val s = Gen.zip(frag, Gen.alphaLowerStr.map(_.take(6)), frag).map { case (x, y, z) => x + y + z }
    val pairs = samples(Gen.zip(s, s), 60) ++ Seq(("", ""), ("", "abc"), ("a", "abcdef"))
    val got = pairs.toDF("a", "b").select(
      partialRatioSim(col("a"), col("b")).as("hof"),
      PartialRatio.sim(col("a"), col("b")).as("native"))
      .as[(Double, Double)].collect()
    got.zip(pairs).foreach { case ((hof, native), (a, b)) =>
      assert(hof == native, s"divergence on ('$a', '$b'): hof=$hof native=$native")
    }
  }

  test("capped near-dup pairs are a subset with jaccard lower-bounded (arbitrary docs)") {
    import spark.implicits._
    import graft.operators.Dedup
    // small vocabulary forces shared shingles and binding caps
    val tok = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val doc = Gen.listOfN(8, tok).map(_.mkString(" "))
    forAll(Gen.listOfN(12, doc), 6) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      def pairs(cap: Option[Int]) =
        Dedup.nearDuplicatePairsExact(df, col("id"), col("t"),
            threshold = 0.2, maxShingleDf = cap)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .as[(Long, Long, Double)].collect()
          .map(p => (p._1, p._2) -> p._3).toMap
      val unc = pairs(None)
      val cap = pairs(Some(3))
      // dropping shingles can only remove matches: subset + lower bound
      assert(cap.keySet.subsetOf(unc.keySet))
      cap.foreach { case (k, j) => assert(j <= unc(k) + 1e-9, s"pair $k: $j > ${unc(k)}") }
    }
  }

  test("estimated Jaccard from signatures: bounded, 1.0 on self, tracks exact (arbitrary docs)") {
    import spark.implicits._
    import graft.operators.IncrementalDedup
    // documents long enough to shingle; random words with repeated draws
    // so Jaccard spans (0, 1), not just the endpoints
    val w = Gen.choose(0, 29).map(i => s"w$i")
    val doc = Gen.listOfN(25, w).map(_.mkString(" "))
    val pairs = samples(Gen.zip(doc, doc), 40)
    val k = 64
    val got = pairs.toDF("x", "y")
      .select(
        Dedup.minHashSignature(Dedup.wordShingles(col("x")), k, 42L).as("sx"),
        Dedup.minHashSignature(Dedup.wordShingles(col("y")), k, 42L).as("sy"),
        Dedup.jaccard(Dedup.wordShingles(col("x")), Dedup.wordShingles(col("y"))).as("j"))
      .select(
        IncrementalDedup.estimatedJaccard(col("sx"), col("sy"), k).as("exy"),
        IncrementalDedup.estimatedJaccard(col("sy"), col("sx"), k).as("eyx"),
        IncrementalDedup.estimatedJaccard(col("sx"), col("sx"), k).as("exx"),
        col("j"))
      .collect()
    assert(got.length == pairs.length)
    got.foreach { r =>
      val (exy, eyx, exx, j) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(exy == eyx)                      // symmetric
      assert(exy >= 0.0 && exy <= 1.0)
      assert(exx == 1.0)                      // self-signature agrees everywhere
      // k=64 → σ = sqrt(J(1−J)/64) ≤ 0.0625; 0.25 = 4σ — a per-pair
      // bound loose enough to never flake under the fixed seeds, tight
      // enough that a broken permutation family cannot pass
      assert(math.abs(exy - j) <= 0.25, s"estimator drift: est=$exy exact=$j")
    }
  }

  test("jaccard is symmetric, bounded, and 1.0 on self") {
    import spark.implicits._
    val arr = Gen.listOf(Gen.alphaStr.map(_.take(4))).map(_.take(6))
    val pairs = samples(Gen.zip(arr, arr), 40)
    val got = pairs.toDF("a", "b").select(
      Dedup.jaccard(col("a"), col("b")).as("ab"),
      Dedup.jaccard(col("b"), col("a")).as("ba"),
      Dedup.jaccard(col("a"), col("a")).as("aa"),
      size(array_distinct(col("a"))).as("na"))
      .collect()
    assert(got.length == pairs.length)
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))                // symmetric
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(if (r.getInt(3) == 0) r.getDouble(2) == 0.0 else r.getDouble(2) == 1.0)
    }
  }

  test("segment dedup conserves segments: every distinct segment survives exactly once (arbitrary docs)") {
    import spark.implicits._
    val docGen: Gen[String] = Gen.listOfN(14,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "x2", " ", "\t"))
      .map(_.mkString(" "))
    val corpora = samples(Gen.listOfN(30, docGen), 4)
    corpora.foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(5)
      val out = graft.operators.Curation.segmentDedup(
        df, col("doc_id"), col("text"), segTokens = 3, minKeepFrac = 0.5)
      val rows = out.collect()
      // conservation: total kept == number of DISTINCT segments corpus-wide
      val distinctSegs = df.select(explode(
          graft.operators.Curation.segmentsCol(col("text"), 3)).as("s"))
        .distinct().count()
      assert(rows.map(_.getLong(2)).sum === distinctSegs)
      // every kept_text's segments are pairwise distinct ACROSS docs too
      val keptSegs = out.select($"id", explode(
          graft.operators.Curation.segmentsCol($"kept_text", 3)).as("s"))
        .groupBy($"s").count().filter($"count" > 1).count()
      assert(keptSegs === 0L)
      // n_kept <= n_seg and flags match the threshold on every row
      rows.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1))
        val frac = if (r.getLong(1) == 0) 1.0
          else r.getLong(2).toDouble / r.getLong(1)
        assert(r.getBoolean(4) === (frac >= 0.5))
      }
    }
  }

  test("bounded-state quantiles equal percentile() on arbitrary grouped data") {
    import spark.implicits._
    // values drawn from mixed regimes: smooth, heavy-duplicate, negative,
    // huge magnitude — grouped unevenly (group 0 gets ~4x group 2's rows)
    val rowGen: Gen[(String, Double)] = for {
      g <- Gen.frequency((4, "a"), (2, "b"), (1, "c"))
      v <- Gen.frequency(
        (3, Gen.choose(-1000.0, 1000.0)),
        (2, Gen.oneOf(0.0, 1.0, 42.0)), // duplicate mass
        (1, Gen.choose(-1.0e12, 1.0e12)))
    } yield (g, v)
    val rows = samples(Gen.listOfN(400, rowGen), 3)
    val ps = Seq(0.1, 0.5, 0.9)
    rows.foreach { data =>
      val df = data.toDF("g", "v").repartition(5)
      val expect = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, array(${ps.mkString("D,")}D))").as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val got = graft.operators.Quantiles.exactGroupQuantiles(
          df, "g", "v", ps, buckets = 32, maxLeafValues = 4, maxRounds = 3)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
      assert(got.keySet === expect.keySet)
      got.foreach { case (g, qs) =>
        qs.zip(expect(g)).foreach { case (x, y) =>
          assert(math.abs(x - y) <= math.max(math.abs(y), 1.0) * 1e-9,
            s"group $g: $x vs $y")
        }
      }
    }
  }
}
