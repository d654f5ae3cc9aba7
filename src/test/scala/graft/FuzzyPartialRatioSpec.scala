package graft

import org.apache.spark.sql.functions._

import graft.functions.DictionaryLocator
import graft.operators.FuzzyLocator

/** E2 parity against the executed reference: goldens below were recorded by
  * scripts/ref_fuzzy_truth.py (sha-pinned detect_location_fuzzy from
  * utils.py:440-492, with fuzzywuzzy's partial_ratio reproduced over stdlib
  * difflib). The Spark scorer replaces difflib's matching-block ratio with
  * windowed normalized levenshtein — this spec pins exactly where the two
  * agree and disagree, so the divergence is measured, not prose.
  */
/** Reference-golden selection cases, shared by [[FuzzyPartialRatioSpec]]
  * (windowed-levenshtein scorer — agreement by measurement) and
  * [[DifflibRatioSpec]] (fuzzywuzzy-exact scorer — agreement by
  * construction, same algorithm as the truth harness).
  */
object FuzzyGoldens {
  // (text, author, reference golden (province, city)) — from ref_fuzzy_truth.py
  val cases: Seq[(String, String, (String, String))] = Seq(
    ("kemarin ke bandng naik kereta", null, ("Jawa Barat", "Bandung")),
    ("warga surabya senang", null, ("Jawa Timur", "Surabaya")),
    ("tangerang seltan macet", null, ("Banten", "Tangerang")),
    ("yogyakata indah", null, ("DI Yogyakarta", "Yogyakarta")),
    ("makasar panas", null, ("Sulawesi Selatan", "Makassar")),
    ("smarang kota lama", null, ("Jawa Tengah", "Semarang")),
    ("di bandungg", null, ("Jawa Barat", "Bandung")),
    ("ke sukabmi", null, ("Jawa Barat", "Sukabumi")),
    ("makan di jakarta pusat", null, ("DKI Jakarta", "Jakarta Pusat")),
    ("liburan ke bali", null, ("Bali", null)),
    ("bandung banten", null, ("Jawa Barat", "Bandung")),
    ("jakarta", null, ("DKI Jakarta", "Jakarta Pusat")),
    ("tangerang selatan", null, ("Banten", "Tangerang")),
    ("menujubandungsekarang", null, ("Jawa Barat", "Bandung")),
    ("kotasurabayaindah", null, ("Jawa Timur", "Surabaya")),
    ("xjakartax", null, ("DKI Jakarta", "Jakarta")),
    ("jawa barat", null, ("DKI Jakarta", "Jakarta Barat")),
    ("sumatera utara juara", null, ("Sumatera Utara", null)),
    ("sulawesi", null, ("Sulawesi Selatan", null)),
    ("tidak ada kota dalam teks ini ya", null, (null, null)),
    ("xyzzy qwerty", null, (null, null)),
    ("", null, (null, null)),
    ("band", null, ("Jawa Barat", "Bandung")),
    ("sura", null, ("Jawa Tengah", "Surakarta")),
    ("jak", null, ("DKI Jakarta", "Jakarta Pusat")),
    ("makan enak", "Budi Bandung", ("Jawa Barat", "Bandung")),
    ("hari baik", "warga_medan", ("Sumatera Utara", "Medan")))
}

class FuzzyPartialRatioSpec extends SparkSpec {

  private val dict = DictionaryLocator.Indonesian
  private val goldens = FuzzyGoldens.cases

  test("detectPartialRatio matches the executed reference on all goldens") {
    import spark.implicits._
    // author_name concatenation mirrors utils.py:457-459
    val df = goldens.zipWithIndex.map { case ((t, a, _), i) =>
      (i.toLong, if (a == null) t else t + " " + a.toLowerCase)
    }.toDF("id", "text")
    val got = FuzzyLocator.detectPartialRatio(df, $"id", $"text", dict)
      .select($"id", $"province", $"city")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val diffs = goldens.zipWithIndex.flatMap { case ((t, a, want), i) =>
      val g = got.getOrElse(i.toLong, (null, null))
      if (g == want) None else Some(s"'$t'${Option(a).fold("")(" | " + _)}: got $g want $want")
    }
    // The scorer is windowed levenshtein, not difflib's matching-block
    // ratio, so agreement is measured, not assumed. On this golden set
    // (typos, exact hits, substring-inside-token alignments, short texts,
    // author concatenation, no-match controls) the selections agree on all
    // 27 cases; raw scores differ (levenshtein ints vs difflib ints) but
    // never enough to flip a selection or cross the 0.7 threshold.
    assert(diffs.isEmpty,
      s"${diffs.size}/${goldens.size} cases diverge from the reference:\n" +
        diffs.mkString("\n"))
  }

  test("substring alignment is visible to the windowed scorer, not the token join") {
    import spark.implicits._
    // the token-join scale path cannot see a city glued inside a token;
    // the partial-ratio path must (this is WHY the two variants coexist)
    val df = Seq((1L, "menujubandungsekarang")).toDF("id", "text")
    val viaJoin = FuzzyLocator.detect(df, $"id", $"text", dict)
      .select($"city").as[String].collect().toSeq
    val viaWindow = FuzzyLocator.detectPartialRatio(df, $"id", $"text", dict)
      .select($"city").as[String].collect().toSeq
    assert(viaJoin.isEmpty)
    assert(viaWindow == Seq("Bandung"))
  }
}
