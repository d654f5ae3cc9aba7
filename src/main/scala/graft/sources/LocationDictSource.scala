package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.functions.DictionaryLocator.LocationDict

/** S6: the location-dimension source — loads the
  * `config/indonesia_locations.json` shape (a single JSON object mapping
  * province -> [cities]; reference loader utils.py:300-333).
  *
  * Ordering contract (SURVEY §7.4 risk 5): Python's json.load preserves
  * file order and the detection cascade's first-match-wins semantics keys
  * on it, so entries come back as an ordered Seq — never a sorted map.
  * Jackson's ObjectNode iterates fields in document order, which is what
  * makes this hold.
  *
  * This is a driver-side dimension load (456 rows): the dictionary rides
  * into the plan as literals (DictionaryLocator) or a broadcast dim table —
  * it is configuration, not data-plane IO.
  */
object LocationDictSource {

  def fromJsonString(json: String): LocationDict = {
    val root = new ObjectMapper().readTree(json)
    require(root != null && root.isObject, "location dictionary must be a JSON object")
    // NOT properties(): this build's properties() does not preserve
    // insertion order (spec-caught: province order shuffled), while
    // fieldNames() iterates the underlying LinkedHashMap in file order —
    // file order is this source's contract
    val entries = root.fieldNames().asScala.map { k =>
      k -> root.get(k).elements().asScala.map(_.asText()).toSeq
    }.toSeq
    LocationDict(entries)
  }

  def fromFile(path: String): LocationDict =
    fromJsonString(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** The reference's fallback dictionary when the JSON file is missing
    * (utils.py:311-318) — same five provinces, same order.
    */
  val default: LocationDict = LocationDict(Seq(
    "DKI Jakarta" -> Seq("Jakarta Selatan", "Jakarta Pusat", "Jakarta Barat",
      "Jakarta Utara", "Jakarta Timur"),
    "Jawa Barat" -> Seq("Bandung", "Bekasi", "Depok", "Cimahi", "Tasikmalaya"),
    "Jawa Tengah" -> Seq("Semarang", "Solo", "Yogyakarta", "Magelang", "Surakarta"),
    "Jawa Timur" -> Seq("Surabaya", "Malang", "Sidoarjo", "Madiun", "Kediri"),
    "Banten" -> Seq("Tangerang", "Serang", "Cilegon", "Tangerang Selatan")))

  def fromFileOrDefault(path: String): LocationDict =
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) fromFile(path)
    else default
}
