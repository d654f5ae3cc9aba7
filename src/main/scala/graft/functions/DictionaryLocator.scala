package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dictionary-based location detection (SURVEY.md §2.4 E1,
  * utils.py:336-437): find a (province, city) in free text by a
  * first-match-wins cascade over an *ordered* dictionary —
  *
  *   (a) exact city name, word-boundary;
  *   (b) any token of a multi-word city name (>2 chars), word-boundary;
  *   (c) abbreviation map;
  *   (d) exact province name, word-boundary.
  *
  * Dictionary order is semantically load-bearing (the reference iterates
  * the JSON's insertion order and breaks on first hit — SURVEY §7.4 risk 5),
  * so entries are a Seq, never a sorted map.
  *
  * Implementation is a folded when-chain of `rlike` predicates over a
  * broadcast-free literal dictionary: unlike the reference's per-row Python
  * loop this compiles to a single codegen'd projection, and unlike a UDF it
  * stays visible to Catalyst. For the 456-city production dictionary the
  * chain is ~500 regex tests per row — still cheap next to a shuffle, and
  * embarrassingly parallel at 100 TB.
  */
object DictionaryLocator {

  /** province -> cities, in dictionary file order. */
  final case class LocationDict(
      entries: Seq[(String, Seq[String])],
      abbreviations: Seq[(String, (String, String))] = Nil) {
    def provinces: Seq[String] = entries.map(_._1)
    def cities: Seq[(String, String)] = // (province, city) in file order
      entries.flatMap { case (p, cs) => cs.map(p -> _) }
  }

  /** Engine-topic dictionary for the synthetic `documents` table. */
  val EngineTopics: LocationDict = LocationDict(Seq(
    "storage" -> Seq("scan", "table", "column"),
    "compute" -> Seq("hash", "sort", "merge", "join"),
    "streaming" -> Seq("stream", "window", "batch")))

  /** Compact Indonesian dictionary for the tweet-parity pipeline — a
    * representative subset of config/indonesia_locations.json (38 provinces
    * / 456 cities in the reference); the full dictionary loads from the same
    * JSON shape via [[graft.sources.LocationDictSource]].
    */
  val Indonesian: LocationDict = LocationDict(
    entries = Seq(
      "DKI Jakarta" -> Seq("Jakarta Pusat", "Jakarta Utara", "Jakarta Barat",
        "Jakarta Selatan", "Jakarta Timur", "Jakarta"),
      "Jawa Barat" -> Seq("Bandung", "Bekasi", "Bogor", "Depok", "Cimahi", "Sukabumi"),
      "Jawa Tengah" -> Seq("Semarang", "Solo", "Surakarta", "Magelang", "Pekalongan"),
      "DI Yogyakarta" -> Seq("Yogyakarta", "Jogja", "Sleman", "Bantul"),
      "Jawa Timur" -> Seq("Surabaya", "Malang", "Kediri", "Madiun", "Batu"),
      "Banten" -> Seq("Tangerang", "Serang", "Cilegon", "Tangerang Selatan"),
      "Sumatera Utara" -> Seq("Medan", "Binjai", "Pematangsiantar"),
      "Sumatera Barat" -> Seq("Padang", "Bukittinggi", "Payakumbuh"),
      "Sulawesi Selatan" -> Seq("Makassar", "Parepare", "Palopo"),
      "Bali" -> Seq("Denpasar")),
    abbreviations = Seq(
      "jaksel" -> ("DKI Jakarta", "Jakarta Selatan"),
      "jakut" -> ("DKI Jakarta", "Jakarta Utara"),
      "jakbar" -> ("DKI Jakarta", "Jakarta Barat"),
      "jaktim" -> ("DKI Jakarta", "Jakarta Timur"),
      "jakpus" -> ("DKI Jakarta", "Jakarta Pusat"),
      "sby" -> ("Jawa Timur", "Surabaya"),
      "bdg" -> ("Jawa Barat", "Bandung"),
      "jogja" -> ("DI Yogyakarta", "Yogyakarta"),
      "makasar" -> ("Sulawesi Selatan", "Makassar")))

  private def quote(s: String): String =
    java.util.regex.Pattern.quote(s.toLowerCase)

  def boundary(word: String): String = "\\b" + quote(word) + "\\b"

  private def hit(province: String, city: String, via: String): Column =
    struct(lit(province).as("province"),
      (if (city == null) lit(null).cast("string") else lit(city)).as("city"),
      lit(via).as("detected_from"))

  /** The cascade as one nullable struct(province, city, detected_from).
    * Null when nothing matches (caller decides the fallback shape).
    */
  def detect(text: Column, dict: LocationDict): Column = {
    val lowered = lower(text)
    val stages: Seq[(Column, Column)] =
      // (a) exact city, dictionary order
      dict.cities.map { case (p, c) =>
        (lowered.rlike(boundary(c)), hit(p, c, "city_match")) } ++
      // (b) any >2-char token of a multi-word city name
      dict.cities.filter(_._2.contains(' ')).flatMap { case (p, c) =>
        c.split("\\s+").filter(_.length > 2).map { tok =>
          (lowered.rlike(boundary(tok)), hit(p, c, "city_token_match")) } } ++
      // (c) abbreviations
      dict.abbreviations.map { case (abbr, (p, c)) =>
        (lowered.rlike(boundary(abbr)), hit(p, c, "abbreviation_match")) } ++
      // (d) province names
      dict.provinces.map { p =>
        (lowered.rlike(boundary(p)), hit(p, null, "province_match")) }
    stages.foldRight(lit(null).cast(
      "struct<province:string,city:string,detected_from:string>")) {
      case ((cond, value), acc) => when(cond, value).otherwise(acc)
    }
  }
}
