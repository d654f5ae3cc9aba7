package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("container sniffing classifies magic bytes without decoding") {
    import spark.implicits._
    val rows = Seq(
      (1L, "89504E470D0A1A0A0000"),             // png
      (2L, "FFD8FFE000104A464946"),             // jpeg
      (3L, "474946383961AA"),                   // gif
      (4L, "52494646AABBCCDD57415645"),         // riff (wav)
      (5L, "0000001C6674797069736F6D"),         // mp4 (ftyp at offset 5)
      (6L, "DEADBEEF00112233"))                 // unknown
      .toDF("id", "hx").select($"id", unhex($"hx").as("payload"))
    val got = rows.select($"id", Multimodal.sniffContainer($"payload"))
      .as[(Long, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == Seq("png", "jpeg", "gif", "riff", "mp4", "unknown"))
  }

  test("frame offsets cover the duration at the sampling interval") {
    import spark.implicits._
    val df = Seq((1L, Some(1000L)), (2L, Some(1L)), (3L, None), (4L, Some(0L)))
      .toDF("id", "duration_ms")
    val got = df.select($"id", Multimodal.frameOffsets($"duration_ms", 250))
      .as[(Long, Seq[Long])].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == Seq(Seq(0L, 250L, 500L, 750L), Seq(0L), Nil, Nil))
  }

  test("batched decode is deterministic and independent of batch size") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i.toLong, s"payload-content-$i".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    def run(bs: Int) =
      Multimodal.decodeFeatures(df, "payload", Multimodal.FakeDecoder(), bs)
        .select($"media_id", $"feat", $"dec_width", $"dec_height")
        .as[(Long, Seq[Float], Int, Int)].collect().sortBy(_._1).toSeq
    val a = run(1)
    assert(run(7) == a && run(32) == a)
    assert(a.head._2.length == 8)
    assert(a.map(_._2).distinct.size == a.size) // content-sensitive features
  }

  test("null/empty payloads fall back to zero features") {
    import spark.implicits._
    val df = Seq((1L, null: Array[Byte]), (2L, Array.empty[Byte]))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeFeatures(df, "payload", Multimodal.FakeDecoder())
      .select($"media_id", $"feat").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(got.forall(_._2.forall(_ == 0f)))
  }

  test("payload checksum and size are stable dedup keys") {
    import spark.implicits._
    val df = Seq((1L, "same"), (2L, "same"), (3L, "different"))
      .toDF("id", "t").select($"id", encode($"t", "UTF-8").as("payload"))
    val got = df.select($"id",
      Multimodal.payloadChecksum($"payload"), Multimodal.payloadSize($"payload"))
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(got(0)._2 == got(1)._2 && got(0)._2 != got(2)._2)
    assert(got(0)._3 == 4)
  }
}
