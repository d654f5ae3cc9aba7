package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.graft.{TextStats, TextStatsExpr}

/** The native byte-loop counters ([[TextStats]]) claim EXACT equality
  * with the regex forms they replaced — `regexp_count(text, "\\S+")`
  * and `regexp_count(text, "[^A-Za-z0-9\\s]")`. These specs pin that
  * differentially: property-based over adversarial alphabets (ASCII ws
  * variants, NBSP — which is \S under the no-unicode-flag semantics —
  * CJK, combining marks, 4-byte supplementary emoji), plus the exact
  * hand cases where byte-level and code-point-level counting could
  * diverge if the loop were wrong.
  */
class TextStatsExprSpec extends SparkSpec {

  // seeded-sampling forAll — the PropertySpec idiom (the
  // scalatest-scalacheck bridge is not on the classpath)
  private def forAll[A](g: Gen[A], n: Int = 400)(check: A => Unit): Unit = {
    val ss = (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(ss.nonEmpty)
    ss.foreach(check)
  }

  private def reTokenCount(s: String): Int = {
    val m = java.util.regex.Pattern.compile("\\S+").matcher(s)
    var c = 0; while (m.find()) c += 1; c
  }
  private def rePunctCount(s: String): Int = {
    val m = java.util.regex.Pattern.compile("[^A-Za-z0-9\\s]").matcher(s)
    var c = 0; while (m.find()) c += 1; c
  }

  private val adversarialChars: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '', '\f', '\r'),
    2 -> Gen.oneOf('.', ',', '!', '-', '@', '#', '_', '"'),
    // non-ASCII whitespace (NBSP, ideographic space, thin space) —
    // all \S under the no-unicode-flag semantics being replicated
    1 -> Gen.oneOf(' ', '　', ' '),
    // 2- and 3-byte letters, a combining mark, a currency sign
    1 -> Gen.oneOf('é', 'ü', 'ñ', '中', '文',
      'あ', '́', '€'))

  private val texts: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    cs <- Gen.listOfN(n, adversarialChars)
  } yield cs.mkString

  test("token_count == regexp_count(\\S+) on adversarial strings (property)") {
    forAll(texts) { s =>
      assert(TextStats.tokenCount(UTF8String.fromString(s)) === reTokenCount(s))
    }
  }

  test("punct_count == regexp_count([^A-Za-z0-9\\s]) on adversarial strings (property)") {
    forAll(texts) { s =>
      assert(TextStats.nonAlnumCount(UTF8String.fromString(s)) === rePunctCount(s))
    }
  }

  test("hand cases: supplementary emoji is ONE punct code point; NBSP separates nothing") {
    val cases = Seq(
      "", " ", "\t\n", "a", "a b", "  a  b  ",
      "a b",          // NBSP is \S here — one token, one punct
      "😀",      // 4-byte emoji: 1 token, 1 punct code point
      "a😀b",    // embedded supplementary: still one token
      "中文 テスト", // CJK: each char one punct, two tokens
      "é",           // combining acute: a punct code point after 'e'
      "w123 w456. [EMAIL]!")
    cases.foreach { s =>
      val u = UTF8String.fromString(s)
      assert(TextStats.tokenCount(u) === reTokenCount(s), s"tokenCount($s)")
      assert(TextStats.nonAlnumCount(u) === rePunctCount(s), s"punctCount($s)")
    }
  }

  test("expression layer: nulls propagate, SQL surface registered, codegen plan") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = Seq(Some("a b. c!"), None, Some("")).toDF("t")
    val out = df.select(
      TextStatsExpr.tokenCount($"t").as("nt"),
      TextStatsExpr.punctCount($"t").as("np")).collect()
    assert(out(0).getInt(0) === 3 && out(0).getInt(1) === 2)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).getInt(0) === 0 && out(2).getInt(1) === 0)

    val viaSql = spark.sql(
      "SELECT token_count('a b. c!') AS nt, punct_count('a b. c!') AS np").head()
    assert(viaSql.getInt(0) === 3 && viaSql.getInt(1) === 2)

    // stays inside whole-stage codegen (a local Seq collapses to
    // LocalTableScan, so drive the expression over a real Range scan)
    val plan = spark.range(3)
      .select(TextStatsExpr.tokenCount(concat_ws(" ", lit("a b"),
        $"id".cast("string"))).as("nt"))
      .queryExecution.executedPlan.toString()
    // "*(1) Project" — the star is the whole-stage-codegen marker
    assert(plan.contains("*(1) Project"), plan)
  }
}
