package graft

import org.apache.spark.sql.functions._

import graft.functions.DictionaryLocator
import graft.operators.FuzzyLocator

class FuzzyLocatorSpec extends SparkSpec {

  private val dict = DictionaryLocator.Indonesian

  test("fuzzy detect recovers typo'd city names above the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "kemarin ke bandng naik kereta"),     // bandung, 1 deletion
      (2L, "warga surabya senang"),              // surabaya, 1 deletion
      (3L, "makan di jakarta pusat"),            // exact
      (4L, "tidak ada kota dalam teks ini ya"),  // nothing
      (5L, "xyzzy qwerty"))                      // nothing
      .toDF("id", "text")
    val got = FuzzyLocator.detect(df, $"id", $"text", dict, threshold = 0.7)
      .select($"id", $"city", $"similarity")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._2 == "Bandung" && byId(1L)._3 < 1.0)
    assert(byId(2L)._2 == "Surabaya" && byId(2L)._3 < 1.0)
    assert(byId(3L)._3 == 1.0) // exact token match scores 1.0
    assert(!byId.contains(4L) && !byId.contains(5L))
  }

  test("cities are preferred over provinces; exact match beats fuzzy") {
    import spark.implicits._
    // 'bali' is both a province name and close to nothing else; 'bandung'
    // city token must beat 'banten' province fuzz
    val df = Seq((1L, "liburan ke bali"), (2L, "bandung banten")).toDF("id", "text")
    val got = FuzzyLocator.detect(df, $"id", $"text", dict, threshold = 0.7)
      .select($"id", $"province", $"city").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, "Bali", null)))
    assert(got(1) == ((2L, "Jawa Barat", "Bandung"))) // kind 0 wins
  }
}
