package graft

import org.apache.spark.sql.functions._

import graft.functions.DictionaryLocator

/** Parity spec for the E1 location cascade: expected values were recorded by
  * executing the reference's detect_location_from_text with the same compact
  * dictionary injected (scripts/ref_locator_truth.py). Covers the
  * province-major ordering, first-exact-else-last-token city semantics, the
  * separator preprocessing, province variations, and the (unreachable)
  * abbreviation branch.
  */
class DictionaryLocatorSpec extends SparkSpec {

  private val truth: Seq[(String, (String, String))] = Seq(
    "jakarta" -> ("DKI Jakarta", "Jakarta"),
    "jakarta selatan" -> ("DKI Jakarta", "Jakarta Selatan"),
    "warga jakarta pusat senang" -> ("DKI Jakarta", "Jakarta Pusat"),
    "selatan" -> ("DKI Jakarta", "Jakarta Selatan"),
    "tangerang" -> ("Banten", "Tangerang"),
    // province-major: DKI's token match beats Banten's exact match
    "tangerang selatan" -> ("DKI Jakarta", "Jakarta Selatan"),
    "di selatan kota" -> ("DKI Jakarta", "Jakarta Selatan"),
    "visiting bandung today" -> ("Jawa Barat", "Bandung"),
    "bandung-bogor" -> ("Jawa Barat", "Bandung"),
    "jalan_jogja|besok" -> ("DI Yogyakarta", "Jogja"),
    // the reference's abbreviation branch is unreachable: no match
    "jaksel" -> (null, null),
    "sby" -> (null, null),
    // token 'barat' of Jakarta Barat wins before the province pass runs
    "jawa barat" -> ("DKI Jakarta", "Jakarta Barat"),
    "sumatera" -> (null, null),
    "sumatera utara" -> ("DKI Jakarta", "Jakarta Utara"),
    // province variation: 'di yogyakarta'.replace(' ','') = 'diyogyakarta'
    "diyogyakarta" -> ("DI Yogyakarta", null),
    "yogyakarta" -> ("DI Yogyakarta", "Yogyakarta"),
    "dki jakarta" -> ("DKI Jakarta", "Jakarta"),
    "jawabarat" -> ("Jawa Barat", null),
    "provinsi bali" -> ("Bali", null),
    "bali" -> ("Bali", null),
    "no location here" -> (null, null),
    "Depok.Sleman" -> ("Jawa Barat", "Depok"),
    "magelang; surakarta" -> ("Jawa Tengah", "Surakarta"),
    "utara" -> ("DKI Jakarta", "Jakarta Utara"),
    "MAKAN DI MEDAN" -> ("Sumatera Utara", "Medan"),
    // exact 'Jakarta' breaks before 'Jakarta Timur' token semantics matter
    "timur jakarta" -> ("DKI Jakarta", "Jakarta"),
    "pusat kota" -> ("DKI Jakarta", "Jakarta Pusat"))

  test("detect() matches the executed reference on the Indonesian dictionary") {
    import spark.implicits._
    val det = DictionaryLocator.detect(col("t"), DictionaryLocator.Indonesian)
    val got = truth.map(_._1).toDF("t")
      .select(det.getField("province"), det.getField("city"))
      .as[(String, String)].collect().toSeq
    truth.zip(got).foreach { case ((in, exp), g) =>
      assert(g == exp, s"mismatch for '$in': got $g, reference gives $exp")
    }
  }

  test("author-name concatenation path") {
    import spark.implicits._
    val det = DictionaryLocator.detect(
      concat_ws(" ", col("t"), col("author")), DictionaryLocator.Indonesian)
    val g = Seq(("makan enak", "Budi Bandung")).toDF("t", "author")
      .select(det.getField("province"), det.getField("city"))
      .as[(String, String)].head()
    assert(g == (("Jawa Barat", "Bandung")))
  }

  test("null and empty text detect nothing") {
    import spark.implicits._
    val det = DictionaryLocator.detect(col("t"), DictionaryLocator.Indonesian)
    val g = Seq(Some(""), None).toDF("t")
      .select(det.isNull).as[Boolean].collect().toSeq
    assert(g == Seq(true, true))
  }
}
