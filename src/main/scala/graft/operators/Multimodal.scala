package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the Spark-side plumbing for decode/feature-extract
  * at scale.
  *
  * Design stance (the 100 TB training-data-pipeline shape):
  *  - payloads are `BinaryType` columns living NEXT TO their metadata
  *    struct, so planning-relevant fields (kind, dimensions, byte size)
  *    prune and filter WITHOUT touching payload bytes — Parquet reads the
  *    metadata column chunks only;
  *  - cheap per-row ops (size, checksum, container sniffing) are pure
  *    column expressions over the binary — codegen'd, no decode;
  *  - real decoding is batched behind [[MediaDecoder]] in `mapPartitions`
  *    (same harness as [[SentimentRunner]]): one decoder instance per
  *    partition, bounded batches, rows never buffered whole-partition.
  *    The container has no imaging libraries, so the shipped decoder is a
  *    DETERMINISTIC STUB ([[FakeDecoder]]) — the Spark plumbing (schema,
  *    batching, output contract) is real and tested; swap the stub for a
  *    JNI/ImageIO-backed implementation to productionize.
  */
object Multimodal {

  /** media metadata carried beside the payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** (media_id, kind, payload, meta) — the canonical media table shape. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMeta)))

  // ------------------------------------------------- payload column ops

  /** Payload byte size (no decode). */
  def payloadSize(payload: Column): Column = length(payload)

  /** 64-bit payload checksum (dedup/integrity key, no decode). */
  def payloadChecksum(payload: Column): Column = xxhash64(payload)

  /** Container sniffing from magic bytes — the binary analogue of the
    * URL-kind filter (P6): classify without decoding.
    */
  def sniffContainer(payload: Column): Column = {
    val head = hex(substring(payload, 1, 8))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("474946"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi
      .when(substring(hex(substring(payload, 5, 4)), 1, 8) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Frame-sample plan for a video payload: capture timestamps (ms) every
    * `everyMs` across meta.duration_ms — pure column arithmetic; the
    * timestamps drive the batched decoder downstream.
    */
  def frameOffsets(durationMs: Column, everyMs: Int): Column =
    when(durationMs.isNotNull && durationMs > 0,
      sequence(lit(0L), durationMs - 1, lit(everyMs.toLong)))
      .otherwise(array().cast("array<bigint>"))

  // ------------------------------------------------- batched decode path

  /** Decoded-feature contract: fixed-width float vector + dims. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("feat", ArrayType(FloatType)),
    StructField("dec_width", IntegerType),
    StructField("dec_height", IntegerType)))

  /** Batched media decoder (the model/codec boundary). Implementations
    * must be Serializable and return one result per input payload, with a
    * null-safe fallback — mirroring the sentiment classifier contract.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Array[Float], Int, Int)]
  }

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec (none ships in this environment). Features are derived from a
    * rolling byte hash so tests get stable, content-sensitive vectors with
    * the real batching/schema semantics.
    */
  final case class FakeDecoder(featDim: Int = 8) extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Array[Float], Int, Int)] =
      payloads.map { p =>
        if (p == null || p.isEmpty) (Array.fill(featDim)(0f), 0, 0)
        else {
          val feat = Array.tabulate(featDim) { i =>
            var h = 1125899906842597L + i
            var j = 0
            while (j < p.length) { h = 31 * h + p(j); j += 1 }
            ((h & 0xffff).toFloat / 0xffff)
          }
          (feat, p.length % 1024, p.length / 1024 + 1)
        }
      }
  }

  /** Decode/feature-extract `payloadCol` in bounded batches per partition,
    * appending the [[decodedSchema]] fields.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String,
      decoder: MediaDecoder, batchSize: Int = 32): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val outSchema = StructType(df.schema.fields ++ decodedSchema.fields)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val decoded = decoder.decodeBatch(
          batch.map(r => if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)))
        batch.lazyZip(decoded).map { case (r, (feat, w, h)) =>
          Row.fromSeq(r.toSeq ++ Seq(feat, w, h))
        }
      }
    }(Encoders.row(outSchema))
  }
}
