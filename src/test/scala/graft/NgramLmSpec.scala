package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** [[NgramLm]]: bigram LM training caps (deterministic tiebreaks), add-one
  * smoothing arithmetic in scaled-integer space, unscored short docs, and
  * the one-doc-grain-exchange scoring contract.
  *
  * Hand-computed fixture: corpus {d1: "a b a b", d2: "a b c", d3: "z",
  * d4: ""} with vocabSize=2 → vocab {a, b}, vtot=3; mapped streams
  * d1=[a,b,a,b], d2=[a,b,&lt;unk&gt;], d3=[&lt;unk&gt;]. Bigram counts
  * (a,b)=3, (b,a)=1, (b,&lt;unk&gt;)=1; history a=3, b=2. With
  * maxBigrams=2 the tie at c=1 breaks on (w1, w2) ascending: '&lt;' sorts
  * before 'a', so (b,&lt;unk&gt;) is kept and (b,a) is dropped to the
  * smoothed floor — the per-doc sums below pin that tiebreak.
  */
class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b"), (2L, "a b c"), (3L, "z"), (4L, "")).toDF("doc_id", "text")

  private def lp(num: Long, den: Long): Long =
    math.round(math.log(num.toDouble / den.toDouble) * NgramLm.LpScale)

  test("train + score match hand-computed smoothed log-probs, caps tiebreak deterministically") {
    val lm = NgramLm.train(docs, "text", vocabSize = 2, maxBigrams = 2)
    val out = NgramLm.score(docs, "text", lm, idCols = Seq("doc_id"))
      .select($"doc_id", $"n_bigrams", $"lp_scaled").orderBy($"doc_id").collect()

    // p(b|a) = (3+1)/(3+3); p(a|b) dropped by the cap -> (0+1)/(2+3);
    // p(<unk>|b) kept -> (1+1)/(2+3)
    val pAB = lp(4, 6); val pBA = lp(1, 5); val pBU = lp(2, 5)
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === pAB + pBA + pAB) // d1: (a,b),(b,a),(a,b)
    assert(out(1).getLong(1) === 2L)
    assert(out(1).getLong(2) === pAB + pBU) // d2: (a,b),(b,<unk>)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // 1 token
    assert(out(3).isNullAt(1) && out(3).isNullAt(2)) // 0 tokens
  }

  test("uncapped vocab keeps rare tokens out of <unk>") {
    val lm = NgramLm.train(docs, "text", vocabSize = 100, maxBigrams = 100)
    val out = NgramLm.score(docs, "text", lm, idCols = Seq("doc_id"))
      .select($"doc_id", $"lp_scaled").orderBy($"doc_id").collect()
    // vocab {a,b,c,z}, vtot=5; counts (a,b)=3,(b,a)=1,(b,c)=1; hist a=3,b=2
    assert(out(1).getLong(1) === lp(4, 8) + lp(2, 7)) // d2: (a,b),(b,c)
  }

  test("history counts come from the uncapped bigram table") {
    // cap to 1 bigram: only (a,b) survives, but h(b)=2 must still reflect
    // BOTH (b,a) and (b,<unk>) — probabilities stay proper under the cap
    val lm = NgramLm.train(docs, "text", vocabSize = 2, maxBigrams = 1)
    val out = NgramLm.score(docs, "text", lm, idCols = Seq("doc_id"))
      .select($"doc_id", $"lp_scaled").orderBy($"doc_id").collect()
    assert(out(1).getLong(1) === lp(4, 6) + lp(1, 5)) // (b,<unk>) now floored
  }

  test("scoring probes are broadcast hash joins; one doc-grain exchange, map-side combined") {
    val lm = NgramLm.train(docs, "text", vocabSize = 2, maxBigrams = 2)
    // materialize the LM relations so only the scoring plan is inspected
    val cached = NgramLm.Lm(lm.vocab.cache(), lm.bigrams.cache(),
      lm.history.cache(), lm.vtot.cache())
    Seq(cached.vocab, cached.bigrams, cached.history, cached.vtot).foreach(_.count())
    val plan = NgramLm.score(docs, "text", cached, idCols = Seq("doc_id"))
      .queryExecution.executedPlan.toString
    val scorePlan = plan.split("InMemoryRelation").head
    // every LM probe is a BroadcastHashJoin — no map-column linear scans,
    // no shuffle joins
    assert(!scorePlan.contains("map_keys"), s"map-column probe in:\n$scorePlan")
    assert(!scorePlan.contains("SortMergeJoin"), s"shuffle join in:\n$scorePlan")
    // exactly one exchange: the doc-grain re-aggregation, fed by a partial
    // aggregate so only one combined row per doc crosses the wire
    val exchanges = "Exchange hashpartitioning".r.findAllIn(scorePlan).length
    assert(exchanges === 1, s"expected 1 doc-grain exchange, got $exchanges:\n$scorePlan")
    assert(scorePlan.contains("partial_count"),
      s"doc-grain agg must be map-side combined:\n$scorePlan")
    Seq(cached.vocab, cached.bigrams, cached.history, cached.vtot).foreach(_.unpersist())
  }
}
