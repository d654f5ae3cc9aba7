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

  test("repaired abbreviation stage: parity mode stays blind, repaired mode expands") {
    import spark.implicits._
    val dict = DictionaryLocator.Indonesian
    val parity = DictionaryLocator.detect(col("t"), dict)
    val repaired = DictionaryLocator.detectRepaired(col("t"), dict)
    val df = Seq(
      "jaksel",                 // repaired: DKI Jakarta / Jakarta Selatan
      "ketemu di sby besok",    // repaired: Jawa Timur / Surabaya
      "jaksel bandung",         // parity city hit wins over the abbreviation
      "jakselx",                // word boundary: no hit in either mode
      "no location here")
      .toDF("t")
      .select(
        parity.getField("province").as("pp"), parity.getField("city").as("pc"),
        repaired.getField("province").as("rp"), repaired.getField("city").as("rc"),
        repaired.getField("detected_from").as("rf"))
      .as[(String, String, String, String, String)].collect().toSeq
    // the reference's branch is dead code (utils.py:384-397): parity mode
    // must detect nothing for bare abbreviations
    assert(df(0) == ((null, null, "DKI Jakarta", "Jakarta Selatan", "abbreviation_match")))
    assert(df(1) == ((null, null, "Jawa Timur", "Surabaya", "abbreviation_match")))
    // the parity cascade still decides rows it can see (fallback-only stage)
    assert(df(2) == (("Jawa Barat", "Bandung", "Jawa Barat", "Bandung", "city_match")))
    assert(df(3) == ((null, null, null, null, null)))
    assert(df(4) == ((null, null, null, null, null)))
  }

  test("detectViaJoin (broadcast n-gram scale path) matches the when-chain cascade") {
    import spark.implicits._
    // the 28 recorded truth cases are all separator-normalizable, so the
    // join path must agree with the regex chain on every one
    val df = truth.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val viaJoin = DictionaryLocator
      .detectViaJoin(df, col("id"), col("t"), DictionaryLocator.Indonesian)
      .select(col("id"), col("province"), col("city"))
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    truth.zipWithIndex.foreach { case ((in, exp), i) =>
      val got = viaJoin.get(i.toLong).map(g => (g._1, g._2)).getOrElse((null, null))
      assert(got == exp, s"join-path mismatch for '$in': got $got, chain/reference gives $exp")
    }
  }

  test("detectViaJoin vs detect() at punctuation: the divergence is exactly the non-separator set") {
    import spark.implicits._
    val dict = DictionaryLocator.Indonesian
    // Punctuation INSIDE the reference's separator set (- / \ | _ , ; .) is
    // normalized to spaces by both paths — they must agree. Punctuation
    // OUTSIDE it is where the paths differ by construction: `\b` anchors at
    // any non-word char, token equality needs the name to be its own
    // whitespace-delimited token.
    val separatorCases = Seq(
      "bandung-bogor", "jakarta.pusat", "depok,hari", "jogja|besok", "medan_kota")
    val punctCases = Seq(
      "jakarta!", "ke bandung?", "(semarang)", "medan:", "'jogja'",
      "\"depok\"", "#bandung", "@medan", "bali+lombok")
    val all = separatorCases ++ punctCases
    val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val chainCol = DictionaryLocator.detect(col("t"), dict)
    val chain = df.select(col("id"), chainCol.getField("province"), chainCol.getField("city"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val join = DictionaryLocator.detectViaJoin(df, col("id"), col("t"), dict)
      .select(col("id"), col("province"), col("city"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def at(i: Int) = (chain.getOrElse(i.toLong, (null, null)),
      join.getOrElse(i.toLong, (null, null)))
    // separator-set punctuation: full agreement, and everything detects
    separatorCases.indices.foreach { i =>
      val (c, j) = at(i)
      assert(c == j, s"separator case '${all(i)}' must agree: chain=$c join=$j")
      assert(c._1 != null, s"separator case '${all(i)}' must detect")
    }
    // non-separator punctuation: the chain's \b sees every name, the token
    // join is blind to ALL of them — the gap is total on this set, which is
    // the measured price of the scale path (9/9 here, 0 partial overlap)
    val disagreements = punctCases.indices.map(i => at(separatorCases.size + i))
    disagreements.zip(punctCases).foreach { case ((c, j), t) =>
      assert(c._1 != null, s"chain must detect punctuation-adjacent '$t'")
      assert(j == ((null, null)), s"token join is blind at '$t' by construction, got $j")
    }
  }

  test("detectViaJoin agrees with detect() on the full 456-city dictionary") {
    import spark.implicits._
    import graft.sources.LocationDictSource
    val refPath = "/root/reference/config/indonesia_locations.json"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(refPath)))
    val dict = LocationDictSource.fromFile(refPath)
    val texts = Seq(
      "pengumuman di banda aceh hari ini", "warga medan antri", "padang panjang ramai",
      "jalan-jalan ke tanjung balai", "makan di jakarta selatan enak",
      "bukittinggi dan payakumbuh", "provinsi sumatera barat maju",
      "tidak ada lokasi", "kota bakti damai", "lubuk pakam macet")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val chain = DictionaryLocator.detect(col("t"), dict)
    val expected = df.select(col("id"), chain.getField("province"), chain.getField("city"))
      .as[(Long, String, String)].collect()
      .filter(r => r._2 != null || r._3 != null).map(r => r._1 -> ((r._2, r._3))).toMap
    val got = DictionaryLocator.detectViaJoin(df, col("id"), col("t"), dict)
      .select(col("id"), col("province"), col("city"))
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
    assert(expected.nonEmpty) // the planted cities actually hit
  }

  test("LocationDictSource preserves file order and parses the province->cities shape") {
    import graft.sources.LocationDictSource
    val json =
      """{
        |  "Zeta Province": ["City B", "City A"],
        |  "Alpha Province": ["City C"],
        |  "Mid Province": []
        |}""".stripMargin
    val dict = LocationDictSource.fromJsonString(json)
    // NOT alphabetical: document order is the cascade's priority order
    assert(dict.provinces == Seq("Zeta Province", "Alpha Province", "Mid Province"))
    assert(dict.entries.head._2 == Seq("City B", "City A"))
    assert(dict.cities == Seq(
      ("Zeta Province", "City B"), ("Zeta Province", "City A"),
      ("Alpha Province", "City C")))
  }

  test("detect() analyzes and runs over a full-size (~456-city) dictionary") {
    // ADVICE r2: the per-province when-chains double expression depth vs
    // the flat chain; prove Spark still analyzes/executes a full-size
    // dictionary (the production config has 38 provinces x 456 cities).
    import spark.implicits._
    import graft.sources.LocationDictSource
    val refPath = "/root/reference/config/indonesia_locations.json"
    val dict =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(refPath)))
        LocationDictSource.fromFile(refPath)
      else // synthetic fallback of the same size/shape
        DictionaryLocator.LocationDict(
          (1 to 38).map(p => s"prov$p" -> (1 to 12).map(c => s"city${p}x$c")))
    assert(dict.cities.size >= 400)
    val det = DictionaryLocator.detect(col("t"), dict)
    val got = Seq(
      "pengumuman di banda aceh hari ini",
      "warga medan antri",
      "tidak ada lokasi disini").toDF("t")
      .select(det.getField("province"), det.getField("city"))
      .as[(String, String)].collect().toSeq
    if (got.head._1 != null) { // real dictionary loaded
      assert(got(0) == (("Aceh", "Banda Aceh")))
      assert(got(1) == (("Sumatera Utara", "Medan")))
    }
    assert(got(2) == ((null, null)))
  }
}
