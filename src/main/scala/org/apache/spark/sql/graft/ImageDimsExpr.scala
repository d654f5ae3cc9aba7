package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Header-parse runtime for [[ImageDimsExpr]] — pure byte arithmetic over
  * the PUBLIC container formats (PNG: the 8-byte signature + IHDR
  * big-endian dims; JPEG: the SOFn marker walk; GIF87a/89a: little-endian
  * logical-screen dims; BMP: BITMAPINFOHEADER little-endian dims). No
  * decode, no library: dimensions come out of the first few dozen bytes,
  * which is what makes the expression safe to run over 100 TB of payload
  * column — it touches O(header) bytes per row regardless of payload
  * size (JPEG walks marker LENGTHS, skipping segment bodies).
  */
object ImageDims {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def le16(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private val Unknown = new GenericInternalRow(
    Array[Any](UTF8String.fromString("unknown"), null, null))

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) Unknown
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

  /** `(format, width, height)`; `("unknown", null, null)` when the bytes
    * are not a parseable PNG/JPEG/GIF/BMP header. Never throws: a media
    * lake always contains some corrupt payloads, and a scan-level
    * expression that raises on them would kill the whole job for one bad
    * row — "unknown" rows are filterable output instead.
    */
  def parse(payload: Array[Byte]): InternalRow = {
    val b = payload
    val n = b.length
    // PNG: signature, then IHDR must be the first chunk (spec-required)
    if (n >= 24 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a &&
        b(7) == 0x0a && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
        b(15) == 'R') {
      row("png", be32(b, 16), be32(b, 20))
    } else if (n >= 4 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte &&
        b(2) == 0xff.toByte) {
      // JPEG: walk marker segments to the first SOFn (C0-CF minus the
      // non-frame C4/C8/CC); height then width, both big-endian, after
      // the 1-byte precision field
      var i = 2
      var out: InternalRow = Unknown
      var done = false
      while (!done && i + 3 < n) {
        if (b(i) != 0xff.toByte) { done = true }
        else {
          val marker = b(i + 1) & 0xff
          if (marker == 0xff) { i += 1 } // fill bytes before a marker
          else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
            i += 2 // standalone markers carry no length
          } else if (marker == 0xd9 || marker == 0xda) {
            done = true // EOI / start-of-scan: no SOF seen, give up
          } else {
            val segLen = be16(b, i + 2)
            if (segLen < 2) { done = true }
            else if (marker >= 0xc0 && marker <= 0xcf &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
              if (i + 8 < n && segLen >= 7) {
                out = row("jpeg", be16(b, i + 7).toLong, be16(b, i + 5).toLong)
              }
              done = true
            } else i += 2 + segLen
          }
        }
      }
      out
    } else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      row("gif", le16(b, 6).toLong, le16(b, 8).toLong)
    } else if (n >= 26 && b(0) == 'B' && b(1) == 'M') {
      // BITMAPINFOHEADER: signed LE32 dims; negative height = top-down
      row("bmp", le32(b, 18).toInt.toLong.abs, le32(b, 22).toInt.toLong.abs)
    } else Unknown
  }
}

/** `image_dims(binary) -> struct<format: string, width: int, height: int>`
  * — container-header dimension extraction as a single whole-stage-codegen
  * expression (the multimodal analogue of the URL-kind filter: classify
  * and measure without decoding). Null iff the payload is null;
  * unparseable bytes yield `("unknown", null, null)`.
  */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dims requires a binary input, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(payload: Any): Any =
    ImageDims.parse(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ImageDims.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDimsExpr {
  def imageDims(payload: Column): Column =
    ExpressionUtils.column(ImageDimsExpr(ExpressionUtils.expression(payload)))
}
