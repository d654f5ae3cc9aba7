package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Binary-column (multimodal) queries. The testdata has no real media
  * table, so payloads are synthesized deterministically (UTF-8 bytes of
  * the document text) — the OPERATORS under test (binary size, checksum,
  * digest aggregation) are the real multimodal surface; only the payload
  * provenance is synthetic.
  */
object MultimodalQueries {

  /** Per-source payload statistics over a binary column: row counts, byte
    * volumes, and a deterministic content digest (min md5) — the
    * shape of a media-lake audit query, no decode anywhere.
    */
  def binaryStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"source", encode($"text", "UTF-8").as("payload"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        sum(Multimodal.payloadSize($"payload")).cast("long").as("total_bytes"),
        max(Multimodal.payloadSize($"payload")).cast("int").as("max_bytes"),
        min(md5($"payload")).as("min_md5"))
      .orderBy($"source")
  }

  // DuckDB md5(varchar) hashes the string's UTF-8 bytes — exactly the
  // payload Spark hashes after encode(text, 'UTF-8').
  val binaryStatsSql: String =
    """SELECT source, count(*) AS n,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(octet_length(encode(text))) AS INT) AS max_bytes,
      |  min(md5(text)) AS min_md5
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------- q_image_dims

  /** REAL container bytes, cross-engine: each document synthesizes a
    * payload in one of the four JDK-supported image container formats
    * (PNG / JPEG / GIF / BMP, dims derived from doc_id; every 17th doc
    * gets its raw text bytes — a corrupt payload), and
    * [[org.apache.spark.sql.graft.ImageDimsExpr]] parses format + width
    * + height back out of the BYTES. The DuckDB oracle builds the SAME
    * blobs with its own hex/unhex arithmetic and re-parses them at the
    * container offsets, so the byte layout (PNG IHDR big-endian, JPEG
    * SOFn walk past a real APP0 segment, GIF/BMP little-endian) is
    * verified across two engines end-to-end. The Spark side uses the
    * GENERAL parser (full JPEG marker walk, not fixed offsets); the spec
    * additionally feeds it `javax.imageio`-encoded real images and
    * multi-segment JPEGs.
    */
  def imageDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def be16(c: Column) = unhex(lpad(hex(c), 4, "0"))
    def be32(c: Column) = unhex(lpad(hex(c), 8, "0"))
    def le16(c: Column) = {
      val s = lpad(hex(c), 4, "0")
      unhex(concat(substring(s, 3, 2), substring(s, 1, 2)))
    }
    def le32(c: Column) = {
      val s = lpad(hex(c), 8, "0")
      unhex(concat(substring(s, 7, 2), substring(s, 5, 2),
        substring(s, 3, 2), substring(s, 1, 2)))
    }
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", $"text",
        ($"doc_id" % 512 + 1).cast("int").as("w"),
        ($"doc_id" % 384 + 1).cast("int").as("h"))
    val png = concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32($"w"), be32($"h"), unhex(lit("0806000000AABBCCDD")))
    val jpeg = concat(
      unhex(lit("FFD8" + "FFE000104A46494600010100004800480000" + "FFC0001108")),
      be16($"h"), be16($"w"), unhex(lit("03012200021101031101")))
    val gif = concat(unhex(lit("474946383961")), le16($"w"), le16($"h"),
      unhex(lit("F70000")))
    val bmp = concat(unhex(lit("424D00000000000000003600000028000000")),
      le32($"w"), le32($"h"), unhex(lit("01001800")))
    // corrupt payloads get a 0x00 prefix: no container magic starts with
    // a NUL, so "looks corrupt" can never collide with a text that
    // happens to start with 'BM'/'GIF' (whose dims the two engines'
    // unknown-handling would then disagree on)
    val payload = when($"doc_id" % 17 === 0,
        concat(unhex(lit("00")), encode($"text", "UTF-8")))
      .when($"doc_id" % 4 === 0, png)
      .when($"doc_id" % 4 === 1, jpeg)
      .when($"doc_id" % 4 === 2, gif)
      .otherwise(bmp)
    docs.select($"doc_id",
        org.apache.spark.sql.graft.ImageDimsExpr.imageDims(payload).as("d"))
      .select($"doc_id", $"d.format".as("format"),
        $"d.width".as("width"), $"d.height".as("height"))
      .orderBy($"doc_id")
  }

  /** DuckDB side: construct the same blobs, then parse width/height back
    * OUT of the blob's hex at the per-format offsets (big-endian =
    * direct hex slice, little-endian = byte-pair swap) — construction
    * and parse are both exercised in each engine.
    */
  val imageDimsSql: String = {
    // 1-indexed hex-char offset of 0-indexed byte k: 2k+1
    def beHex(off: Int, bytes: Int) = s"substr(hx, ${2 * off + 1}, ${2 * bytes})"
    def le16Hex(off: Int) =
      s"substr(hx, ${2 * (off + 1) + 1}, 2) || substr(hx, ${2 * off + 1}, 2)"
    def le32Hex(off: Int) =
      s"substr(hx, ${2 * (off + 3) + 1}, 2) || substr(hx, ${2 * (off + 2) + 1}, 2) || " +
        s"substr(hx, ${2 * (off + 1) + 1}, 2) || substr(hx, ${2 * off + 1}, 2)"
    def toInt(hexExpr: String) = s"CAST(('0x' || ($hexExpr)) AS INT)"
    s"""WITH src AS (
       |  SELECT doc_id, text,
       |    CAST(doc_id % 512 + 1 AS INT) AS w, CAST(doc_id % 384 + 1 AS INT) AS h
       |  FROM documents),
       |built AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN doc_id % 17 = 0 THEN unhex('00') || encode(text)
       |      WHEN doc_id % 4 = 0 THEN
       |        unhex('89504E470D0A1A0A0000000D49484452' || lpad(hex(w), 8, '0')
       |          || lpad(hex(h), 8, '0') || '0806000000AABBCCDD')
       |      WHEN doc_id % 4 = 1 THEN
       |        unhex('FFD8FFE000104A46494600010100004800480000FFC0001108'
       |          || lpad(hex(h), 4, '0') || lpad(hex(w), 4, '0')
       |          || '03012200021101031101')
       |      WHEN doc_id % 4 = 2 THEN
       |        unhex('474946383961'
       |          || substr(lpad(hex(w), 4, '0'), 3, 2) || substr(lpad(hex(w), 4, '0'), 1, 2)
       |          || substr(lpad(hex(h), 4, '0'), 3, 2) || substr(lpad(hex(h), 4, '0'), 1, 2)
       |          || 'F70000')
       |      ELSE
       |        unhex('424D00000000000000003600000028000000'
       |          || substr(lpad(hex(w), 8, '0'), 7, 2) || substr(lpad(hex(w), 8, '0'), 5, 2)
       |          || substr(lpad(hex(w), 8, '0'), 3, 2) || substr(lpad(hex(w), 8, '0'), 1, 2)
       |          || substr(lpad(hex(h), 8, '0'), 7, 2) || substr(lpad(hex(h), 8, '0'), 5, 2)
       |          || substr(lpad(hex(h), 8, '0'), 3, 2) || substr(lpad(hex(h), 8, '0'), 1, 2)
       |          || '01001800')
       |    END AS payload
       |  FROM src),
       |hexed AS (SELECT doc_id, hex(payload) AS hx FROM built)
       |SELECT doc_id,
       |  CASE
       |    WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
       |    WHEN substr(hx, 1, 6) = 'FFD8FF' THEN 'jpeg'
       |    WHEN substr(hx, 1, 12) IN ('474946383961', '474946383761') THEN 'gif'
       |    WHEN substr(hx, 1, 4) = '424D' THEN 'bmp'
       |    ELSE 'unknown' END AS format,
       |  CASE
       |    WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${toInt(beHex(16, 4))}
       |    WHEN substr(hx, 1, 6) = 'FFD8FF' THEN ${toInt(beHex(27, 2))}
       |    WHEN substr(hx, 1, 12) = '474946383961' THEN ${toInt(le16Hex(6))}
       |    WHEN substr(hx, 1, 4) = '424D' THEN ${toInt(le32Hex(18))}
       |    ELSE NULL END AS width,
       |  CASE
       |    WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${toInt(beHex(20, 4))}
       |    WHEN substr(hx, 1, 6) = 'FFD8FF' THEN ${toInt(beHex(25, 2))}
       |    WHEN substr(hx, 1, 12) = '474946383961' THEN ${toInt(le16Hex(8))}
       |    WHEN substr(hx, 1, 4) = '424D' THEN ${toInt(le32Hex(22))}
       |    ELSE NULL END AS height
       |FROM hexed ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_stats" -> (binaryStats _),
    "q_image_dims" -> (imageDims _))

  val oracles: Map[String, String] = Map(
    "q_binary_stats" -> binaryStatsSql,
    "q_image_dims" -> imageDimsSql)
}
