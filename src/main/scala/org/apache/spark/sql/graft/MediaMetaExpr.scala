package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Header-parse runtime for [[MediaMetaExpr]] — container DURATION out of
  * the PUBLIC audio/video container layouts, the time-axis sibling of
  * [[ImageDims]]:
  *
  *  - MP4/ISO-BMFF: top-level box walk to `moov`, inner walk to `mvhd`;
  *    v0 carries (timescale BE32 @12, duration BE32 @16) in the box
  *    payload, v1 (timescale @20, duration BE64 @24) —
  *    duration_ms = duration·1000/timescale;
  *  - AVI: RIFF walk to `LIST hdrl`, whose first chunk is `avih`
  *    (spec-required): dwMicroSecPerFrame LE32 @0 × dwTotalFrames LE32
  *    @16 — duration_ms = µs/frame·frames/1000;
  *  - WAV: RIFF/WAVE chunk walk collecting `fmt ` (byte rate LE32 @8)
  *    and `data` (payload size) — duration_ms = size·1000/byteRate.
  *
  * All walks skip chunk BODIES by their declared lengths (O(header)
  * bytes touched per row regardless of payload size — the property that
  * makes the expression safe over 100 TB of payload column), apply
  * bounds checks everywhere, and never throw: unparseable bytes yield
  * `("unknown", null)` the same way [[ImageDims.parse]] does.
  */
object MediaMeta {

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length && b(i) == s.charAt(0).toByte && b(i + 1) == s.charAt(1).toByte &&
      b(i + 2) == s.charAt(2).toByte && b(i + 3) == s.charAt(3).toByte

  private val Unknown = new GenericInternalRow(
    Array[Any](UTF8String.fromString("unknown"), null))

  private def row(fmt: String, ms: Long): InternalRow =
    if (ms < 0) Unknown
    else new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), ms))

  def parse(payload: Array[Byte]): InternalRow = {
    val b = payload
    val n = b.length
    if (n >= 16 && tag(b, 4, "ftyp")) parseMp4(b, n)
    else if (n >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "AVI ")) parseAvi(b, n)
    else if (n >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) parseWav(b, n)
    else Unknown
  }

  private def parseMp4(b: Array[Byte], n: Int): InternalRow = {
    var i = 0L
    while (i + 8 <= n) {
      val size = be32(b, i.toInt)
      if (size < 8) return Unknown // size==1 (64-bit) / 0 (to-EOF) unsupported
      if (tag(b, i.toInt + 4, "moov")) {
        val end = math.min(i + size, n.toLong)
        var j = i + 8
        while (j + 8 <= end) {
          val s2 = be32(b, j.toInt)
          if (s2 < 8) return Unknown
          if (tag(b, j.toInt + 4, "mvhd")) {
            val p = j.toInt + 8
            if (p >= n) return Unknown
            val version = b(p) & 0xff
            if (version == 0 && p + 20 <= n) {
              val ts = be32(b, p + 12)
              val dur = be32(b, p + 16)
              return if (ts <= 0) Unknown else row("mp4", dur * 1000L / ts)
            } else if (version == 1 && p + 32 <= n) {
              val ts = be32(b, p + 20)
              val dur = be64(b, p + 24)
              return if (ts <= 0) Unknown else row("mp4", dur * 1000L / ts)
            } else return Unknown
          }
          j += s2
        }
        return Unknown
      }
      i += size
    }
    Unknown
  }

  private def parseAvi(b: Array[Byte], n: Int): InternalRow = {
    var i = 12L
    while (i + 8 <= n) {
      val size = le32(b, i.toInt + 4) // RIFF chunk: fourcc(4) then size(4)
      if (tag(b, i.toInt, "LIST") && tag(b, i.toInt + 8, "hdrl")) {
        // avih is the REQUIRED first chunk of hdrl
        val j = i.toInt + 12
        if (j + 8 + 20 <= n && tag(b, j, "avih")) {
          val us = le32(b, j + 8)
          val frames = le32(b, j + 8 + 16)
          // both fields are full unsigned 32-bit: an adversarial header
          // can overflow Long in us*frames and wrap POSITIVE-but-wrong
          // (the ms<0 guard below only catches negative wraps)
          if (us > 0L && frames > Long.MaxValue / us) return Unknown
          return row("avi", us * frames / 1000L)
        }
        return Unknown
      }
      i += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    Unknown
  }

  private def parseWav(b: Array[Byte], n: Int): InternalRow = {
    var byteRate = -1L
    var dataSize = -1L
    var i = 12L
    while (i + 8 <= n && (byteRate < 0 || dataSize < 0)) {
      val size = le32(b, i.toInt + 4) // RIFF chunk: fourcc(4) then size(4)
      if (tag(b, i.toInt, "fmt ") && i + 16 + 4 <= n)
        byteRate = le32(b, i.toInt + 16)
      else if (tag(b, i.toInt, "data"))
        dataSize = size
      i += 8 + size + (size & 1)
    }
    if (byteRate > 0 && dataSize >= 0) row("wav", dataSize * 1000L / byteRate)
    else Unknown
  }
}

/** `media_meta(binary) -> struct<format: string, duration_ms: bigint>` —
  * container-header duration extraction as a single whole-stage-codegen
  * expression: the time axis of the multimodal surface ([[ImageDimsExpr]]
  * covers the spatial one). Null iff the payload is null; unparseable
  * bytes yield `("unknown", null)`.
  */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_meta requires a binary input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = true)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "media_meta"

  override protected def nullSafeEval(payload: Any): Any =
    MediaMeta.parse(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MediaMeta.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MediaMetaExpr {
  def mediaMeta(payload: Column): Column =
    ExpressionUtils.column(MediaMetaExpr(ExpressionUtils.expression(payload)))
}
