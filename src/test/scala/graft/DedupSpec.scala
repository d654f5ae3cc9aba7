package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("wordShingles handles short and empty documents (ANSI mode)") {
    import spark.implicits._
    // < n tokens used to drive sequence(1, 0) descending and crash with
    // INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode.
    val got = Seq("", "one", "one two", "one two three", "a b c d")
      .toDF("t").select(Dedup.wordShingles(col("t"), 3)).as[Seq[String]].collect().toSeq
    assert(got(0) == Nil)
    assert(got(1) == Nil)
    assert(got(2) == Nil)
    assert(got(3) == Seq("one two three"))
    assert(got(4) == Seq("a b c", "b c d"))
  }

  test("shingles are distinct") {
    import spark.implicits._
    val got = Seq("x y x y x y x y")
      .toDF("t").select(Dedup.wordShingles(col("t"), 2)).as[Seq[String]].head()
    assert(got.sorted == Seq("x y", "y x"))
  }

  test("jaccard on distinct-element semantics, safe on empties") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),       // 1.0
      (Seq("a", "b"), Seq("b", "c")),       // 1/3
      (Seq.empty[String], Seq("a")),        // 0.0
      (Seq.empty[String], Seq.empty[String])) // 0/0 -> 0.0
      .toDF("a", "b")
    val got = df.select(round(Dedup.jaccard(col("a"), col("b")), 4)).as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.3333, 0.0, 0.0))
  }

  test("exact dedup keeps one deterministic representative per key") {
    import spark.implicits._
    val df = Seq((1L, "A"), (2L, "a "), (3L, "b"), (4L, "A"))
      .toDF("id", "t")
    val got = Dedup.exact(df, lower(trim(col("t"))), col("id"))
      .select(col("id")).as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L)) // lowest id per normalized-text key
  }

  test("minHashNearDuplicates finds the planted near-dup and survives short docs") {
    import spark.implicits._
    val long1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val long2 = (1 to 40).map(i => s"tok$i").mkString(" ") + " extra"  // ~0.95 jaccard
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, long1), (2L, long2), (3L, other),
      (4L, ""), (5L, "two tokens"), (6L, "one"))  // the regression rows
      .toDF("id", "text")
    val pairs = Dedup.minHashNearDuplicates(df, col("id"), col("text"), threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH drops empty-shingle docs before the band explode (hot-bucket fix)") {
    import spark.implicits._
    // 200 short docs used to share the identity signature -> one quadratic
    // LSH bucket (200*199/2 candidate pairs). After the fix they never reach
    // the self-join at all.
    val shorts = (1 to 200).map(i => (i.toLong, s"short $i"))
    val long1 = (1 to 40).map(i => s"tok$i").mkString(" ")
    val long2 = long1 + " extra"
    val df = (shorts ++ Seq((900L, long1), (901L, long2))).toDF("id", "text")
    val pairs = Dedup.minHashNearDuplicates(df, col("id"), col("text"), threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)))
  }

  test("minHash maxBandBucketQuantile cap is one-sided on a degenerate corpus") {
    import spark.implicits._
    // 40 exact copies of one document: every copy lands in all 16 of its
    // band buckets, so those buckets are the observed hot tail. A q=0.5
    // cap drops them (40 >> the singleton-median), losing the copy pairs
    // — the documented one-sided trade — while never inventing a pair.
    val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val copies = (1 to 40).map(i => (i.toLong, boiler))
    val others = (1 to 30).map(i =>
      (100L + i, (1 to 40).map(j => s"u${i}w$j").mkString(" ")))
    val df = (copies ++ others).toDF("id", "text")
    def run(cap: Option[Double]) = Dedup.minHashNearDuplicates(
        df, col("id"), col("text"), threshold = 0.5,
        maxBandBucketQuantile = cap)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val uncapped = run(None)
    val capped = run(Some(0.5))
    assert(uncapped.size == 40 * 39 / 2) // sanity: all copy pairs found
    assert(capped.subsetOf(uncapped), "cap added a spurious pair")
    assert(capped.size < uncapped.size, "q=0.5 cap dropped nothing")
  }

  test("exact near-dup pairs match brute-force jaccard") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      1L -> base.mkString(" "),
      2L -> (base :+ "x").mkString(" "),              // near-dup of 1
      3L -> base.take(15).mkString(" "),              // ~0.46 vs 1 — below 0.5
      4L -> (100 to 130).map(i => s"w$i").mkString(" "),
      5L -> (100 to 130).map(i => s"w$i").mkString(" "), // exact dup of 4
      6L -> "too short")
    val df = docs.toDF("id", "text")
    val got = Dedup.nearDuplicatePairsExact(df, col("id"), col("text"), threshold = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    // brute force over the same shingle definition
    def shingles(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val expect = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      jr = BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jr >= 0.5
    } yield (ia, ib, jr)).toSet
    assert(got == expect)
    assert(got.contains((4L, 5L, 1.0)))
  }

  test("maxShingleDf drops hot shingles: bounded candidates, recall kept, jaccard lower-bounded") {
    import spark.implicits._
    // 400 docs share exactly one "stop shingle" (the 3-token phrase; every
    // other shingle is doc-unique) — uncapped, that single join key yields
    // 400*399/2 candidate rows.
    val hotDocs = (1 to 400).map(i => (i.toLong, s"terima kasih banyak u${i}a u${i}b u${i}c"))
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val rare = Seq(900L -> (base + " enda"), 901L -> (base + " endb"))
    // a near-dup pair whose overlap INCLUDES the hot shingle
    val mixed = Seq(
      950L -> "terima kasih banyak w1 w2 w3 w4 w5 enda2",
      951L -> "terima kasih banyak w1 w2 w3 w4 w5 endb2")
    val docs = (hotDocs ++ rare ++ mixed).toDF("id", "text")

    def run(cap: Option[Int]) =
      Dedup.nearDuplicatePairsExact(docs, col("id"), col("text"),
          threshold = 0.5, maxShingleDf = cap)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val uncapped = run(None)
    val capped = run(Some(10))

    // recall on the planted pairs is 100% with the cap on; no hot-group
    // pair appears either way (their single shared shingle is far below 0.5)
    assert(uncapped.keySet == Set((900L, 901L), (950L, 951L)))
    assert(capped.keySet == Set((900L, 901L), (950L, 951L)))
    // rare-overlap pair: untouched by the cap, exact jaccard both ways
    assert(capped((900L, 901L)) == uncapped((900L, 901L)))
    // mixed pair: the dropped hot shingle leaves c=5 of 6 shared shingles —
    // the capped jaccard is a strict lower bound of the true 0.75
    assert(uncapped((950L, 951L)) == 0.75)
    assert(capped((950L, 951L)) == 0.5556)

    // candidate volume: count the self-join rows the operator would feed the
    // aggregate, with and without the cap (same shingle definition)
    val ex = docs
      .select(col("id"), explode(Dedup.wordShingles(col("text"))).as("s"))
    val keptEx = ex.join(
      ex.groupBy(col("s")).agg(count(lit(1)).as("df")).filter(col("df") <= 10).select(col("s")),
      Seq("s"))
    def candidates(e: org.apache.spark.sql.DataFrame): Long = {
      val a = e.select(col("id").as("ia"), col("s"))
      val b = e.select(col("id").as("ib"), col("s"))
      a.join(b, Seq("s")).filter(col("ia") < col("ib")).count()
    }
    val candUncapped = candidates(ex)
    val candCapped = candidates(keptEx)
    assert(candUncapped >= 400L * 399 / 2) // the hot shingle went quadratic
    assert(candCapped < 100)               // the cap collapses it to the planted pairs
  }

  test("Charikar boundary recovery: output equals the partition-agnostic candidate rule") {
    import spark.implicits._
    // Adversarial partitioning: many range partitions over few rows, so
    // a large share of sorted-adjacent pairs straddle partition edges.
    // With boundary recovery the operator must produce EXACTLY the pairs
    // of the global (partition-free) sliding-window rule + the hamming-0
    // equi-join — not a subset that shrinks as partitions multiply.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "48")
      // one 30-member near-dup family (shared base + one rare token each:
      // fingerprints within small hamming of each other, sorting adjacent
      // in every rotation) + 50 unrelated docs with disjoint vocabularies
      val base = (1 to 60).map(i => s"w$i").mkString(" ")
      val docs = ((1 to 30).map(i => i.toLong -> s"$base zz$i") ++
        (100 until 150).map(i => i.toLong -> (i * 70 to i * 70 + 50).map(j => s"u$j").mkString(" ")))
        .toDF("id", "text")
      val rotations = 8; val window = 4; val maxHamming = 3
      val got = Dedup.simHashNearDuplicates(docs, col("id"), col("text"),
          maxHamming = maxHamming, rotations = rotations, window = window)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
      // driver-side global simulation of the same candidate rule
      val fps = docs.select(col("id"),
          Dedup.simHash(Dedup.tokens(lower(col("text")))).as("fp"))
        .as[(Long, Long)].collect()
      def rotl(x: Long, k: Int): Long = if (k == 0) x else (x << k) | (x >>> (64 - k))
      def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
      val step = 64 / rotations
      val expected = scala.collection.mutable.Map.empty[(Long, Long), Int]
      def offer(a: Long, b: Long, h: Int): Unit = {
        val k = (math.min(a, b), math.max(a, b))
        if (h <= maxHamming) expected.update(k, math.min(h, expected.getOrElse(k, 64)))
      }
      for (r <- 0 until rotations) {
        val sortedRows = fps.map { case (id, fp) => (rotl(fp, r * step), id, fp) }
          .sortBy(t => (t._1, t._2))
        for {
          i <- sortedRows.indices
          j <- math.max(0, i - window) until i
        } offer(sortedRows(j)._2, sortedRows(i)._2, ham(sortedRows(j)._3, sortedRows(i)._3))
      }
      for { // hamming-0 equi-join pairs
        (ia, fa) <- fps; (ib, fb) <- fps if ia < ib && fa == fb
      } offer(ia, ib, 0)
      assert(expected.nonEmpty && expected.exists(_._2 > 0),
        "test is vacuous: no non-exact near-dup pairs planted")
      assert(got == expected.toMap,
        s"missing=${(expected.keySet -- got.keySet).toSeq.sorted.take(10)} " +
          s"spurious=${(got.keySet -- expected.keySet).toSeq.sorted.take(10)}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("maxShingleDfQuantile drops only the observed hot tail (scale-adaptive cap)") {
    import spark.implicits._
    // same planted corpus as the absolute-cap test: one stop shingle
    // shared by 402 docs (df=402), every informative shingle at df<=2.
    // p99.9 of that df distribution is ~2, so the quantile cap must drop
    // exactly the hot key and keep every planted pair with the SAME
    // scores as the absolute cap — no hand-tuned constant anywhere.
    val hotDocs = (1 to 400).map(i => (i.toLong, s"terima kasih banyak u${i}a u${i}b u${i}c"))
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val rare = Seq(900L -> (base + " enda"), 901L -> (base + " endb"))
    val mixed = Seq(
      950L -> "terima kasih banyak w1 w2 w3 w4 w5 enda2",
      951L -> "terima kasih banyak w1 w2 w3 w4 w5 endb2")
    val docs = (hotDocs ++ rare ++ mixed).toDF("id", "text")
    def run(cap: Option[Int], q: Option[Double]) =
      Dedup.nearDuplicatePairsExact(docs, col("id"), col("text"),
          threshold = 0.5, maxShingleDf = cap, maxShingleDfQuantile = q)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val qCapped = run(None, Some(0.999))
    assert(qCapped == run(Some(10), None),
      "quantile cap must reproduce the absolute cap's pruning on this corpus")
    assert(qCapped.keySet == Set((900L, 901L), (950L, 951L)))
    // both modes at once is a caller bug
    intercept[IllegalArgumentException] { run(Some(4), Some(0.999)) }
  }

  test("minhash signature similarity tracks jaccard") {
    import spark.implicits._
    val a = (1 to 50).map(i => s"w$i").mkString(" ")
    val b = (1 to 50).map(i => s"w$i").mkString(" ") + " x y z"
    val c = (200 to 250).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
      .select(col("id"), Dedup.minHashSignature(Dedup.wordShingles(col("t"), 3)).as("sig"))
    val sigs = df.as[(Long, Seq[Long])].collect().sortBy(_._1).map(_._2)
    def agree(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count(p => p._1 == p._2).toDouble / x.size
    assert(agree(sigs(0), sigs(1)) > 0.7)  // near-dups agree on most rows
    assert(agree(sigs(0), sigs(2)) < 0.2)  // unrelated docs rarely collide
  }

  test("Charikar sorted-rotation pairs: subset of brute force, exact dups never missed") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (200 to 260).map(i => s"w$i").mkString(" ")
    // exact-dup cluster of SIX — more than window+1, so its far pairs sort
    // more than `window` lead steps apart in EVERY rotation (identical
    // values order by id everywhere); only the fingerprint equi-join can
    // report all 15 pairs
    // filler vocabularies are DISJOINT (stride 50 > doc width 41): filler
    // docs contribute no expected pairs, so the deterministic part of the
    // answer (hamming-0) dominates and the recall floor below cannot flake
    // on range-partition boundaries (which shift with RDD ids across suite
    // orderings); token-less docs (30, 31) must be ignored entirely
    val docs = (Seq(
      1L -> base, 2L -> base, 3L -> base, 4L -> base, 5L -> base, 6L -> base,
      10L -> other, 11L -> other,                  // second cluster
      20L -> (base + " extra"),                    // near-miss of the first
      30L -> "", 31L -> "   ",                     // degenerate: no tokens
      32L -> "\t", 33L -> "\n\n \r"                // non-space whitespace only:
                                                   // \s-class chars trim() keeps
    ) ++ (100 until 150).map(i => i.toLong -> (i * 50 to i * 50 + 40).map(j => s"u$j").mkString(" ")))
    val df = docs.toDF("id", "text")

    val got = Dedup.simHashNearDuplicates(df, col("id"), col("text"), maxHamming = 3)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap

    // brute-force truth over the same fingerprints (token-less docs are
    // out of scope by the operator's contract — exclude them here too)
    val fps = df.filter(size(Dedup.tokens(lower(col("text")))) > 0)
      .select(col("id"), Dedup.simHash(Dedup.tokens(lower(col("text")))))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val expected = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = ham(fps(a), fps(b)) if h <= 3
    } yield (a, b) -> h).toMap

    // exact hamming verification ⇒ no false positives, correct distances
    got.foreach { case (k, h) => assert(expected.get(k).contains(h), s"false positive $k") }
    // hamming-0 pairs can never be missed: the fingerprint equi-join
    // reports every pair of an exact-dup cluster, including the 6-doc
    // cluster's far pairs that the window scan cannot see
    val exactDups = expected.filter(_._2 == 0).keySet
    val sixCluster = (for { a <- 1L to 6L; b <- 1L to 6L if a < b } yield (a, b)).toSet
    assert((sixCluster + ((10L, 11L))).subsetOf(exactDups))
    assert(exactDups.subsetOf(got.keySet))
    // no pair may touch a token-less doc — including the tab/newline-only
    // docs that an ASCII-space trim() gate would keep (all token-less docs
    // fingerprint to 0L, so two surviving ones pair at hamming 0)
    assert(!got.keySet.exists { case (a, b) => a >= 30L && a <= 33L || b >= 30L && b <= 33L })
    // recall floor chosen so the DETERMINISTIC hamming-0 pairs alone
    // satisfy it (16 of <= 22 expected): boundary-dependent recovery of
    // the near-miss pairs can only raise it, never flake it
    val recall = got.size.toDouble / expected.size
    assert(recall >= 0.7, s"recall $recall (${got.size}/${expected.size})")
  }

  test("simHash: near-identical token bags have small hamming distance") {
    import spark.implicits._
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val b = (1 to 58).map(i => s"w$i").mkString(" ")
    val c = (300 to 360).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "t")
      .select(col("id"), Dedup.simHash(Dedup.tokens(col("t"))).as("h"))
    val hs = df.as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)))
    assert(ham(hs(0), hs(1)) <= 12)
    // empty token array: zero votes on every bit -> fingerprint 0, no crash
    val e = Seq("").toDF("t").select(Dedup.simHash(Dedup.tokens(col("t")))).as[Long].head()
    assert(e == 0L)
  }

  test("connectedComponents merges chains, triangles, and keeps disjoint clusters apart") {
    import spark.implicits._
    // component A: a 5-node CHAIN 1-2-3-4-5 (diameter 4 — forces real
    // iteration, a single propagation step cannot finish it);
    // component B: triangle 10-11-12 (the over-delete case a pair list
    // mishandles); component C: lone edge 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, $"id_a", $"id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    // keep-one-per-cluster: exactly the three representatives survive
    assert(comp.count { case (n, r) => n == r } === 3)
  }

  test("large-star/small-star converges in O(log diameter) rounds on a planted chain") {
    import spark.implicits._
    // a 65-node path (diameter 64) — label propagation needed 64 rounds;
    // alternating star rounds fold the chain onto its minimum in ~log2
    val chain = (1L until 65L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(
      chain, $"id_a", $"id_b", maxIterations = 20)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.keySet == (1L to 65L).toSet)
    assert(got.values.toSet == Set(1L))
    assert(rounds <= 9, s"diameter-64 chain took $rounds rounds (want <= ceil(log2 64)+3)")
  }

  test("connectedComponents raises loudly when a component's diameter exceeds the cap") {
    import spark.implicits._
    // hash-scatter the chain's edges: the local-contraction pre-pass
    // collapses co-located runs, so a sequentially-sliced chain would
    // contract to a near-star and converge under any cap — scattering
    // keeps the post-contraction diameter real so the cap still binds.
    // Driven through the FIXPOINT entry point: the public wrapper's
    // driver-local short-circuit absorbs any sub-cap edge set before
    // maxIterations can matter (that path is exercised below and by
    // every small-graph arm in this suite)
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartition(16, $"id_a")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsWithRounds(
        chain, $"id_a", $"id_b", maxIterations = 1)._1.collect()
    }
    assert(e.getMessage.contains("not converged"))
    // and the same graph converges with an adequate cap
    val ok = Dedup.connectedComponents(chain, $"id_a", $"id_b", maxIterations = 40)
      .collect().map(r => r.getLong(1)).distinct
    assert(ok.toSeq === Seq(1L))
    // the short-circuit and the fixpoint agree row-for-row on this graph
    val viaFixpoint = Dedup.connectedComponentsWithRounds(
        chain, $"id_a", $"id_b", maxIterations = 40)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLocal = Dedup.connectedComponents(chain, $"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLocal === viaFixpoint)
  }

  test("local-contraction pre-pass preserves the exact canonical labeling across layouts") {
    import spark.implicits._
    // adversarial mix: two chains (one straddling any partition cut), a
    // 40-node star, triangles, a bridge merging two dense blobs, random
    // extra edges, duplicate + reversed-duplicate edges, self-loops —
    // compared against a driver-side union-find ground truth under three
    // partition layouts (all-in-one, few, many): the contraction's
    // output must be BIT-identical to the canonical node → min(component)
    // labeling regardless of which edges co-locate
    val rnd = new scala.util.Random(7)
    val blobA = (101L to 120L).flatMap(i => (i + 1 to 120L).filter(_ => rnd.nextBoolean()).map((i, _)))
    val blobB = (201L to 220L).flatMap(i => (i + 1 to 220L).filter(_ => rnd.nextBoolean()).map((i, _)))
    val edges: Seq[(Long, Long)] =
      (1L to 30L).map(i => (i, i + 1)) ++            // chain
      (301L to 340L).map(i => (300L, i)) ++           // star
      Seq((400L, 401L), (401L, 402L), (400L, 402L)) ++ // triangle
      blobA ++ blobB ++ Seq((115L, 210L)) ++          // bridge
      Seq((2L, 1L), (1L, 2L), (5L, 5L), (300L, 300L)) // dups/reversed/self
    // ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      parent.getOrElseUpdate(a, find(a)); parent.getOrElseUpdate(b, find(b))
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    for (parts <- Seq(1, 3, 16)) {
      val df = edges.toDF("id_a", "id_b").repartition(parts)
      val got = Dedup.connectedComponents(df, $"id_a", $"id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"labeling diverged at $parts partitions")
    }
  }

  // ------------------------------------------- prefix-filtered Jaccard join

  /** Distinct candidate pairs of the FULL inverted-index join (every pair
    * sharing >= 1 shingle) — the baseline prefixCandidates must beat.
    */
  private def invertedCandidates(docs: org.apache.spark.sql.DataFrame): Long = {
    val sh = docs.select(col("doc_id").as("__id"),
        Dedup.wordShingles(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) >= 1)
    val ex = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    ex.select(col("__id").as("ia"), col("__s"))
      .join(ex.select(col("__id").as("ib"), col("__s")), Seq("__s"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib")).distinct().count()
  }

  test("prefixJaccardPairs equals the full inverted-index join on the corpus") {
    import spark.implicits._
    val docs = Tables.wide(spark, "/root/testdata/sf0.001", "documents")
    for (t <- Seq(0.5, 0.8)) {
      val want = Dedup.nearDuplicatePairsExact(docs, $"doc_id", $"text", threshold = t)
        .orderBy($"id_a", $"id_b").collect().toSeq
      val got = Dedup.prefixJaccardPairs(docs, $"doc_id", $"text", threshold = t)
        .orderBy($"id_a", $"id_b").collect().toSeq
      assert(got == want, s"threshold $t: prefix join diverged from exact join")
      assert(want.nonEmpty || t > 0.5) // the 0.5 gate corpus has planted pairs
    }
  }

  private def explodedShingles(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id").as("__id"),
        Dedup.wordShingles(col("text"), 3).as("__sh"))
      .select(col("__id"), size(col("__sh")).as("__n"),
        explode_outer(col("__sh")).as("__s"))

  test("prefix filtering shrinks the candidate set on the corpus") {
    import spark.implicits._
    val docs = Tables.wide(spark, "/root/testdata/sf0.001", "documents")
    val full = invertedCandidates(docs)
    val pruned = Dedup.prefixCandidates(explodedShingles(docs), threshold = 0.5).count()
    assert(pruned < full,
      s"prefix candidates $pruned not below inverted-index candidates $full")
    // and every surviving true pair is still found (subset sanity is the
    // equality test above; this pins that the reduction is real, not 0%)
    assert(pruned <= full / 2,
      s"expected >= 2x candidate reduction at t=0.5, got $pruned vs $full")
  }

  test("boilerplate stop-shingles never enter the prefix index") {
    import spark.implicits._
    // 120 docs: 6 unique lead tokens each (no cross-doc overlap), then the
    // SAME 12-token boilerplate tail. Pairwise jaccard = 10/(10+2*4) = 0.357
    // < 0.8, so the true answer is EMPTY — but every pair shares the 10
    // boilerplate shingles, so the inverted index generates all C(120,2)
    // candidates. Rarest-first prefixes are the doc-unique lead shingles;
    // the hot boilerplate keys (df=120) sort last and are never indexed.
    val boiler = (1 to 12).map(i => s"terms of service clause$i").mkString(" ")
    val docs = (1 to 120).map(d =>
        (d.toLong, (1 to 6).map(i => s"u${d}w$i").mkString(" ") + " " + boiler))
      .toDF("doc_id", "text")
    val full = invertedCandidates(docs)
    assert(full == 120L * 119 / 2) // quadratic by construction
    val pruned = Dedup.prefixCandidates(explodedShingles(docs), threshold = 0.8).count()
    assert(pruned == 0,
      s"boilerplate corpus should yield zero prefix candidates at t=0.8, got $pruned")
    // and a genuinely near-identical pair still surfaces through the prefix
    val planted = docs.union(Seq(
      (1000L, (1 to 6).map(i => s"u7w$i").mkString(" ") + " " + boiler)).toDF("doc_id", "text"))
    val got = Dedup.prefixJaccardPairs(planted, $"doc_id", $"text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((7L, 1000L, 1.0)))
  }
}
