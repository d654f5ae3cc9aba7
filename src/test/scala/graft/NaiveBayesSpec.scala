package graft

import graft.ml.NaiveBayes
import graft.operators.NgramLm

/** [[NaiveBayes]]: hand-computed smoothed log-likelihoods, vocabulary cap
  * tiebreak, argmax class-ascending tiebreak, token-less docs absent,
  * class-cap guard.
  *
  * Fixture: train {A: "aa aa", "aa bb"; B: "cc cc", "cc bb"} → vocab
  * [aa, cc, bb] (count desc, token asc), vtot = 4; class A tokens
  * aa:3 bb:1 (N=4), class B cc:3 bb:1 (N=4); priors ln(1/2) each.
  */
class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  private def scaled(x: Double): Long =
    BigDecimal(x * NgramLm.LpScale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private val train = Seq(
    ("A", "aa aa"), ("A", "aa bb"),
    ("B", "cc cc"), ("B", "cc bb")).toDF("lang", "text")

  test("matrix and priors match hand-computed add-one smoothing") {
    val m = NaiveBayes.train(train, "text", "lang")
    val lp = m.matrix.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(lp(("aa", "A")) === scaled(math.log(4.0 / 8.0))) // (3+1)/(4+4)
    assert(lp(("bb", "A")) === scaled(math.log(2.0 / 8.0)))
    assert(lp(("cc", "A")) === scaled(math.log(1.0 / 8.0)))
    assert(lp((NgramLm.Unk, "B")) === scaled(math.log(1.0 / 8.0)))
    assert(lp.size === 8) // dense: (3 vocab + unk) x 2 classes
    val pr = m.priors.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr === Map("A" -> scaled(math.log(0.5)), "B" -> scaled(math.log(0.5))))
  }

  test("predictions: learned separation, unk ties break class-ascending, empty docs absent") {
    val m = NaiveBayes.train(train, "text", "lang")
    val test = Seq(
      (1L, "aa"), (2L, "cc cc bb"), (3L, "zz"), (4L, "")).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "text", m, Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "A",  // aa is an A word
      2L -> "B",  // cc cc bb dominated by B
      3L -> "A")) // <unk> scores equal in both classes -> 'A' < 'B'
    // doc 4 has no tokens -> no score rows -> absent by contract
  }

  test("class cap fails loudly") {
    val wide = Seq.tabulate(5)(i => (s"c$i", "tok")).toDF("lang", "text")
    intercept[IllegalArgumentException] {
      NaiveBayes.train(wide, "text", "lang", maxClasses = 3)
    }
  }
}
