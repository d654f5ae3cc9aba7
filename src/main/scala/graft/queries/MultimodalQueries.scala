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

  // ------------------------------------------------------ q_dhash_pairs

  /** Perceptual-dedup constants shared by the Spark payload builder and
    * the DuckDB oracle (shared-constant discipline, the q_minhash_pairs
    * precedent). Grid bit i (i = row·8 + col) of doc d:
    *
    *  - corrupt docs (d % 11 == 5): payload is 0x00 + raw text bytes —
    *    undecodable by contract; the operator must DROP them;
    *  - family docs (d % 11 == 0): groups g = (d/11) % 8 share a base
    *    gradient pattern; variant r = (d/88) % 3 flips 0 / 1 / 3 bits at
    *    g-derived positions — planted near-dup clusters, including
    *    hamming-0 classes that exercise the identical-hash pre-collapse;
    *  - everything else: popcount-parity pseudorandom bits (expected
    *    pairwise hamming 32 — band-bucket noise, no pairs).
    *
    * bit_count parity (popcount of a linear form) is the hash because
    * BOTH engines compute it natively over BIGINT — a multiplicative
    * residue hash collapses docs into mod-p classes and floods the
    * corpus with accidental near-dups.
    */
  private val DhG = 8 // family group count

  /** Grid bit i of doc `d` (both arguments are columns — `i` may be a
    * lambda variable inside a higher-order fold).
    */
  private def dhashBit(d: Column, i: Column): Column = {
    val fam = d % 11 === 0
    val g = floor(d / 11).cast("long") % DhG
    val r = floor(d / 88).cast("long") % 3
    val base = bit_count(g * 40503L + i * 2654435761L) % 2
    val flip = when((r === 1 || r === 2) && i === (g * 5) % 64, 1)
      .when(r === 2 &&
        (i === (g * 7 + 13) % 64 || i === (g * 3 + 29) % 64), 1)
      .otherwise(0)
    when(fam, (base + flip) % 2)
      .otherwise(bit_count(d * 40503L + i * 2654435761L + 777L) % 2)
      .cast("long")
  }

  /** The 64 grid bits of doc `d` as Spark columns (b(0)..b(63)). */
  private def dhashBits(d: Column): IndexedSeq[Column] =
    (0 until 64).map(i => dhashBit(d, lit(i.toLong)).cast("int"))

  /** Deterministic synthetic media frame (media_id, payload) — a real
    * 9×8 24-bit BMP per doc encoding [[dhashBits]]'s gradient-sign
    * pattern, or a corrupt payload (0x00 + raw text bytes) for planted
    * corrupt docs. Shared by [[dhashPairs]] (the oracle corpus) and the
    * streaming capstone's image stage (the testdata has no media table;
    * the payload bytes and every decode downstream of them are real).
    *
    * Codegen discipline: the whole builder is a few hundred expression
    * nodes. The 64 bits fold into two 32-bit half-longs via a
    * higher-order `aggregate` (the lambda body — one [[dhashBit]] —
    * is generated ONCE and looped at runtime), and every pixel derives
    * from the halves via small arithmetic inside a `transform` over
    * pixel index. Two earlier formulations unrolled the 64 bit trees
    * (and then the 72 pixel trees referencing them) into the
    * projection, generating a 20k-line `processNext` that blew janino's
    * 64 KB method limit and silently dropped the stage to the
    * interpreted path.
    */
  def syntheticMedia(docs: DataFrame, d: Column, text: Column): DataFrame = {
    // bits folded into two non-negative 32-bit halves (a single signed-64
    // pack would be fine two's-complement-wise, but halves keep every
    // value positive for the double-exact pow arithmetic below)
    def half(lo: Int): Column =
      aggregate(sequence(lit(lo.toLong), lit(lo + 31L)), lit(0L),
        (acc, i) => acc + dhashBit(d, i) *
          pow(lit(2.0), i - lo).cast("long"))
    val staged = docs.select(
      d.as("media_id"), text.as("__text"),
      half(0).as("__dhLo"), half(32).as("__dhHi"))
    // one row's 28 storage bytes (9 gray pixels ×3 + pad): the row byte
    // comes out of its half by a literal shift (y is unrolled in Scala),
    // and v(x, y) = 100 + 4·popcount(row-prefix bits below x) − 2x with
    // the prefix mask as exact double pow (x ≤ 8) inside the transform
    def rowHex(y: Int): Column = {
      val halfCol = if (y < 4) col("__dhLo") else col("__dhHi")
      val rowByte = shiftrightunsigned(halfCol, (y % 4) * 8)
        .bitwiseAND(lit(0xffL)).cast("double")
      concat(array_join(
        transform(sequence(lit(0), lit(8)), x => {
          val pc = bit_count(pmod(rowByte, pow(lit(2.0), x)).cast("long"))
          val v = (lit(100) + pc * 4 - x * 2).cast("int")
          val h = lpad(hex(v), 2, "0")
          concat(h, h, h)
        }), ""), lit("00"))
    }
    // 54-byte header: BM, size 278, offset 54; BITMAPINFOHEADER 9×8,
    // 1 plane, 24 bpp, BI_RGB, image size 224 (8 rows of 27+1 pad)
    val header = "424D16010000000000003600000028000000" +
      "0900000008000000" + "01001800" + "00000000" + "E0000000" +
      "130B0000130B0000" + "0000000000000000"
    val rows = (7 to 0 by -1).map(rowHex) // bottom-up row order
    val bmp = unhex(concat(lit(header) +: rows: _*))
    val payload = when(col("media_id") % 11 === 5,
        concat(unhex(lit("00")), encode(col("__text"), "UTF-8")))
      .otherwise(bmp)
    staged.select(col("media_id"), payload.as("payload"))
  }

  /** REAL image-decode path, cross-engine: each document synthesizes a
    * 9×8 24-bit BMP whose pixel gray values encode a deterministic
    * 64-bit gradient-sign pattern (doc_id arithmetic, [[dhashBits]]),
    * plus planted corrupt payloads — see [[syntheticPayload]]. The SPARK
    * side runs the full production pipeline — payload bytes → batched
    * `javax.imageio` decode → luminance grid → [[Multimodal.dHash64]] →
    * identical-hash pre-collapse → banded candidate join → Hamming
    * verify. The DuckDB oracle never decodes: it re-derives the grid
    * bits from the same arithmetic, folds them into the 8 band bytes,
    * replays band join + bit_count Hamming — so the encode → decode →
    * grid → hash chain is verified end-to-end across two engines (the
    * q_image_dims discipline, one level deeper: actual pixels, not just
    * headers).
    *
    * Pixel construction: v(0, y) = 100; v(x+1, y) = v(x, y) ± 2 by bit
    * (y·8 + x) — values stay in [84, 116], and the 9×8 image maps 1:1
    * onto the decoder's 9×8 grid, so decoded cell luma IS the pixel
    * value (integer Rec.601 of gray: (299v+587v+114v)/1000 = v).
    */
  def dhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = syntheticMedia(
      Tables(spark, dir, "documents"), $"doc_id", $"text")
    Multimodal.dHashNearDuplicates(media, $"media_id", $"payload", maxHamming = 6)
      .orderBy($"id_a", $"id_b")
  }

  /** DuckDB side: same bits from the same arithmetic (no decode), folded
    * into 8 band bytes; pairs = band-join matches with total Hamming ≤ 6.
    */
  val dhashPairsSql: String =
    """WITH ids AS (SELECT doc_id AS d FROM documents WHERE doc_id % 11 <> 5),
      |bits AS (
      |  SELECT d, i,
      |    CASE WHEN d % 11 = 0 THEN
      |      (bit_count(((d // 11) % 8) * 40503 + i * 2654435761) % 2
      |       + CASE WHEN ((d // 88) % 3 IN (1, 2))
      |                   AND i = (((d // 11) % 8) * 5) % 64 THEN 1
      |              WHEN (d // 88) % 3 = 2
      |                   AND (i = (((d // 11) % 8) * 7 + 13) % 64
      |                     OR i = (((d // 11) % 8) * 3 + 29) % 64) THEN 1
      |              ELSE 0 END) % 2
      |    ELSE bit_count(d * 40503 + i * 2654435761 + 777) % 2 END AS b
      |  FROM ids, range(64) t(i)),
      |bands AS (
      |  SELECT d, i // 8 AS band,
      |    CAST(sum(b * (1::BIGINT << (i % 8))) AS BIGINT) AS key
      |  FROM bits GROUP BY d, i // 8),
      |cand AS (
      |  SELECT DISTINCT a.d AS id_a, b.d AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.key = b.key AND a.d < b.d),
      |ham AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(sum(bit_count(xor(ka.key, kb.key))) AS INT) AS hamming
      |  FROM cand c
      |  JOIN bands ka ON ka.d = c.id_a
      |  JOIN bands kb ON kb.d = c.id_b AND kb.band = ka.band
      |  GROUP BY c.id_a, c.id_b)
      |SELECT id_a, id_b, hamming FROM ham
      |WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------------ q_audio_energy

  /** REAL audio-decode path, cross-engine (the q_dhash_pairs discipline,
    * audio modality): each document synthesizes a canonical 44-byte-header
    * PCM WAV — 8 frames × 20 samples at 8 kHz mono 16-bit, every sample
    * in frame f holding the constant doc_id-derived amplitude
    * A(d, f) = 500 + (d·31 + f·97) mod 3000 — and every 13th doc gets a
    * corrupt payload (0x00 + text bytes) the decoder must drop. The
    * SPARK side runs payload bytes → `javax.sound.sampled` decode →
    * per-frame RMS ([[Multimodal.WavDecoder]]) — RMS of a constant frame
    * IS the amplitude, exactly (sqrt of an exact integer square), so the
    * DuckDB oracle re-derives the energies from the amplitude arithmetic
    * without decoding. Output: one row per (doc, frame).
    */
  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = $"doc_id"
    def le16(c: Column) = {
      val s = lpad(hex(c), 4, "0")
      concat(substring(s, 3, 2), substring(s, 1, 2))
    }
    // RIFF/WAVE canonical PCM header: chunk size 36+320, fmt 16/1/1,
    // 8000 Hz, byte rate 16000, block align 2, 16-bit, data 320
    val header = "52494646" + "64010000" + "57415645" +
      "666D7420" + "10000000" + "0100" + "0100" + "401F0000" + "803E0000" +
      "0200" + "1000" + "64617461" + "40010000"
    val frames = (0 until 8).map { f =>
      val amp = lit(500) + (d * 31 + lit(f * 97)) % 3000
      repeat(le16(amp), 20)
    }
    val wav = unhex(concat(lit(header) +: frames: _*))
    val payload = when(d % 13 === 0,
        concat(unhex(lit("00")), encode($"text", "UTF-8")))
      .otherwise(wav)
    val media = Tables(spark, dir, "documents")
      .select(d.as("doc_id"), payload.as("payload"))
    Multimodal.decodeFeatures(
        media.select($"doc_id", $"payload"), "payload",
        Multimodal.WavDecoder(), batchSize = 64)
      .filter($"dec_width" > 0) // corrupt payloads decode to 0 Hz
      .select($"doc_id", posexplode($"feat").as(Seq("frame", "__rms")))
      .select($"doc_id", $"frame", $"__rms".cast("int").as("energy"))
      .orderBy($"doc_id", $"frame")
  }

  val audioEnergySql: String =
    """SELECT doc_id, CAST(f AS INT) AS frame,
      |  CAST(500 + (doc_id * 31 + f * 97) % 3000 AS INT) AS energy
      |FROM documents, range(8) t(f)
      |WHERE doc_id % 13 <> 0
      |ORDER BY doc_id, frame""".stripMargin

  // ------------------------------------------------------- q_media_meta

  /** Container DURATION metadata, cross-engine (q_image_dims's time-axis
    * sibling): each document synthesizes an MP4 (ftyp + moov/mvhd v0),
    * an AVI (RIFF/LIST hdrl/avih) or a WAV (fmt + data declaration)
    * header with doc_id-derived timescale/duration/frame fields, plus
    * corrupt payloads; [[org.apache.spark.sql.graft.MediaMetaExpr]]
    * walks the BYTES back out (box walk, RIFF chunk walk — the general
    * parsers, not fixed offsets), and the DuckDB oracle builds the SAME
    * blobs with hex arithmetic and re-parses them at the per-format
    * offsets — construction and parse both exercised in each engine.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = $"doc_id"
    def be32(c: Column) = lpad(hex(c), 8, "0")
    def le32(c: Column) = {
      val s = lpad(hex(c), 8, "0")
      concat(substring(s, 7, 2), substring(s, 5, 2),
        substring(s, 3, 2), substring(s, 1, 2))
    }
    // mp4: ftyp(16) + moov(116) with mvhd v0; 80 trailing payload zeros
    val ts = lit(600) + d % 1000
    val dur = (d % 90000) * 100
    val mp4 = concat(lit("00000010" + "66747970" + "69736F6D" + "00000200" +
      "00000074" + "6D6F6F76" + "0000006C" + "6D766864" +
      "00000000" + "00000000" + "00000000"),
      be32(ts), be32(dur), lit("00" * 80))
    // avi: RIFF(80) AVI + LIST(68) hdrl + avih(56): us@0, frames@16
    val us = lit(33333) + d % 1000
    val frames = d % 2000
    val avi = concat(lit("52494646"), le32(lit(80)), lit("41564920" +
      "4C495354"), le32(lit(68)), lit("6864726C" + "61766968"), le32(lit(56)),
      le32(us), lit("00" * 12), le32(frames), lit("00" * 36))
    // wav: headers only — the walk skips the (absent) data body by its
    // declared size, so duration comes from the declaration
    val br = lit(8000) + d % 64000
    val ds = d % 100000
    val wav = concat(lit("52494646"), le32(ds + 36), lit("57415645" +
      "666D7420"), le32(lit(16)), lit("0100" + "0100"), le32(lit(8000)),
      le32(br), lit("0200" + "1000" + "64617461"), le32(ds))
    val payload = when(d % 4 === 0,
        concat(unhex(lit("00")), encode($"text", "UTF-8")))
      .when(d % 4 === 1, unhex(mp4))
      .when(d % 4 === 2, unhex(avi))
      .otherwise(unhex(wav))
    Tables(spark, dir, "documents")
      .select(d.as("doc_id"),
        org.apache.spark.sql.graft.MediaMetaExpr.mediaMeta(payload).as("m"))
      .select($"doc_id", $"m.format".as("format"),
        $"m.duration_ms".as("duration_ms"))
      .orderBy($"doc_id")
  }

  /** DuckDB side: construct the same blobs (hex arithmetic), parse the
    * fields back OUT at the per-format offsets, divide as integer
    * floors — construction and parse both exercised in each engine (the
    * imageDimsSql shape).
    */
  val mediaMetaSql: String = {
    // 1-indexed hex-char offset of 0-indexed byte k: 2k+1
    def beAt(off: Int) = s"CAST(('0x' || substr(hx, ${2 * off + 1}, 8)) AS BIGINT)"
    def leAt(off: Int) =
      s"CAST(('0x' || substr(hx, ${2 * (off + 3) + 1}, 2) || " +
        s"substr(hx, ${2 * (off + 2) + 1}, 2) || " +
        s"substr(hx, ${2 * (off + 1) + 1}, 2) || " +
        s"substr(hx, ${2 * off + 1}, 2)) AS BIGINT)"
    def le32(e: String) =
      s"substr(lpad(hex($e), 8, '0'), 7, 2) || substr(lpad(hex($e), 8, '0'), 5, 2) || " +
        s"substr(lpad(hex($e), 8, '0'), 3, 2) || substr(lpad(hex($e), 8, '0'), 1, 2)"
    def be32(e: String) = s"lpad(hex($e), 8, '0')"
    val mp4Hex = "'000000106674797069736F6D00000200" +
      "000000746D6F6F760000006C6D766864000000000000000000000000' || " +
      s"${be32("ts")} || ${be32("dur")} || repeat('00', 80)"
    val aviHex = s"'52494646' || ${le32("80")} || '415649204C495354' || " +
      s"${le32("68")} || '6864726C61766968' || ${le32("56")} || " +
      s"${le32("us")} || repeat('00', 12) || ${le32("frames")} || repeat('00', 36)"
    val wavHex = s"'52494646' || ${le32("ds + 36")} || '57415645666D7420' || " +
      s"${le32("16")} || '01000100' || ${le32("8000")} || ${le32("br")} || " +
      s"'02001000' || '64617461' || ${le32("ds")}"
    s"""WITH src AS (
       |  SELECT doc_id, text,
       |    600 + doc_id % 1000 AS ts, (doc_id % 90000) * 100 AS dur,
       |    33333 + doc_id % 1000 AS us, doc_id % 2000 AS frames,
       |    8000 + doc_id % 64000 AS br, doc_id % 100000 AS ds
       |  FROM documents),
       |built AS (
       |  SELECT doc_id,
       |    CASE
       |      WHEN doc_id % 4 = 0 THEN '00' || hex(encode(text))
       |      WHEN doc_id % 4 = 1 THEN $mp4Hex
       |      WHEN doc_id % 4 = 2 THEN $aviHex
       |      ELSE $wavHex
       |    END AS hx
       |  FROM src)
       |SELECT doc_id,
       |  CASE
       |    WHEN substr(hx, 9, 8) = '66747970' THEN 'mp4'
       |    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920' THEN 'avi'
       |    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
       |    ELSE 'unknown' END AS format,
       |  CASE
       |    WHEN substr(hx, 9, 8) = '66747970' THEN (${beAt(48)} * 1000) // ${beAt(44)}
       |    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '41564920'
       |      THEN (${leAt(32)} * ${leAt(48)}) // 1000
       |    WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645'
       |      THEN (${leAt(40)} * 1000) // ${leAt(28)}
       |    ELSE NULL END AS duration_ms
       |FROM built ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_stats" -> (binaryStats _),
    "q_image_dims" -> (imageDims _),
    "q_dhash_pairs" -> (dhashPairs _),
    "q_audio_energy" -> (audioEnergy _),
    "q_media_meta" -> (mediaMeta _))

  val oracles: Map[String, String] = Map(
    "q_binary_stats" -> binaryStatsSql,
    "q_image_dims" -> imageDimsSql,
    "q_dhash_pairs" -> dhashPairsSql,
    "q_audio_energy" -> audioEnergySql,
    "q_media_meta" -> mediaMetaSql)
}
