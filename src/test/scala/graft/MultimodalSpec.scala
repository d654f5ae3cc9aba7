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

  // ------------------------------ real bytes: ImageDims + ImageIO + dHash

  /** Deterministic test image: a gradient + seeded-noise RGB raster,
    * encoded by the JDK's own ImageIO writers — REAL encoder output, not
    * hand-assembled headers.
    */
  private def makeImage(w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / math.max(1, w - 1) + y * 255 / math.max(1, h - 1)) / 2
      val n = rnd.nextInt(32)
      val v = math.min(255, base + n)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encodeBytes(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer in JDK")
    bos.toByteArray
  }

  test("image_dims parses real ImageIO-encoded PNG/JPEG/GIF/BMP headers") {
    import spark.implicits._
    val rows = Seq(
      (1L, encodeBytes(makeImage(320, 200, 1L), "png"), "png", 320, 200),
      (2L, encodeBytes(makeImage(17, 43, 2L), "jpg"), "jpeg", 17, 43),
      (3L, encodeBytes(makeImage(64, 48, 3L), "gif"), "gif", 64, 48),
      (4L, encodeBytes(makeImage(100, 7, 4L), "bmp"), "bmp", 100, 7))
    val df = rows.map(r => (r._1, r._2)).toDF("id", "payload")
    val got = df.select($"id",
        org.apache.spark.sql.graft.ImageDimsExpr.imageDims($"payload").as("d"))
      .select($"id", $"d.format", $"d.width", $"d.height")
      .as[(Long, String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(got == rows.map(r => (r._1, r._3, r._4, r._5)))
  }

  test("image_dims walks multi-segment JPEGs and survives corrupt bytes") {
    import spark.implicits._
    def hexB(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI + APP1 (EXIF-shaped, 12 bytes) + COM + DQT stub + SOF2
    // (progressive) — the SOF is the FOURTH segment, nothing fixed-offset
    val multiSeg = hexB("FFD8" +
      "FFE1000C457869660000AABBCCDD" + // APP1 len 12
      "FFFE0004ABCD" +                 // COM len 4
      "FFDB0005AA0102" +               // DQT-ish len 5 (3 payload bytes)
      "FFC2000B08" + "0100" + "0180" + "03010203") // SOF2: h=256 w=384
    val cases = Seq(
      (1L, multiSeg, ("jpeg", Some(384), Some(256))),
      (2L, hexB("FFD8FFE100"), ("unknown", None, None)),      // truncated
      (3L, hexB("0089504E47"), ("unknown", None, None)),      // shifted magic
      (4L, "plain text".getBytes("UTF-8"), ("unknown", None, None)),
      (5L, hexB("FFD8FFD9"), ("unknown", None, None)))        // SOI+EOI, no SOF
    val df = cases.map(c => (c._1, c._2)).toDF("id", "payload")
    val got = df.select($"id",
        org.apache.spark.sql.graft.ImageDimsExpr.imageDims($"payload").as("d"))
      .select($"id", $"d.format", $"d.width", $"d.height")
      .as[(Long, String, Option[Int], Option[Int])].collect().sortBy(_._1).toSeq
    assert(got == cases.map(c => (c._1, c._3._1, c._3._2, c._3._3)))
  }

  test("ImageIODecoder decodes real pixels: dims and luminance grid") {
    import spark.implicits._
    val img = makeImage(90, 80, 7L)
    val df = Seq((1L, encodeBytes(img, "png")), (2L, "junk".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeFeatures(df, "payload", Multimodal.ImageIODecoder())
      .select($"media_id", $"feat", $"dec_width", $"dec_height")
      .as[(Long, Seq[Float], Int, Int)].collect().sortBy(_._1).toSeq
    assert(got(0)._3 == 90 && got(0)._4 == 80)
    assert(got(0)._2.length == 72)
    // the planted gradient brightens left→right: last grid column must be
    // brighter than the first on every row
    val feat = got(0)._2
    for (y <- 0 until 8) assert(feat(y * 9 + 8) > feat(y * 9))
    // corrupt payload: zero grid, 0×0
    assert(got(1)._3 == 0 && got(1)._2.forall(_ == 0f))
  }

  test("dHash near-duplicates find planted perceptual pairs across formats") {
    import spark.implicits._
    val base = makeImage(120, 90, 21L)
    // near-dup 1: same pixels, different container (png vs bmp — lossless)
    val sameAsBmp = encodeBytes(base, "bmp")
    // near-dup 2: same image with a small local tweak
    val tweaked = makeImage(120, 90, 21L)
    for (y <- 0 until 5; x <- 0 until 5) tweaked.setRGB(x, y, 0xffffff)
    // unrelated image: INVERTED gradient — makeImage(seed) only varies the
    // noise, and dHash keys on gradient signs, so a same-structure image
    // would (correctly) register as a perceptual near-dup
    val other = new java.awt.image.BufferedImage(
      120, 90, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 90; x <- 0 until 120) {
      val v = 255 - (x * 255 / 119 + y * 255 / 89) / 2
      other.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val rows = Seq(
      (1L, encodeBytes(base, "png")), (2L, sameAsBmp),
      (3L, encodeBytes(tweaked, "png")), (4L, encodeBytes(other, "png")),
      (5L, "corrupt".getBytes("UTF-8")), (6L, "corrupt2".getBytes("UTF-8")))
    val got = Multimodal.dHashNearDuplicates(
        rows.toDF("id", "payload"), $"id", $"payload", maxHamming = 6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "identical pixels in two containers")
    assert(got.contains((1L, 3L)), "small local tweak")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "unrelated image paired")
    assert(!got.exists(p => p._1 >= 5L || p._2 >= 5L), "corrupt payloads paired")
  }

  test("pigeonhole banding: exact recall at EVERY radius vs brute force") {
    import spark.implicits._
    // adaptive banding (maxHamming+1 disjoint segments — 1 band of 64
    // bits at k=0 up to the classic 8x8 at k=7) must produce EXACTLY the
    // brute-force pair set at each radius: pairs within k may never be
    // lost to banding (the pigeonhole guarantee), pairs outside k may
    // never appear (the verify filter). Patterns are known bits, so the
    // expected set is computed directly from hamming distances.
    val rnd = new scala.util.Random(20260815L)
    val base = Seq.tabulate(64)(_ => rnd.nextInt(2))
    val patterns: Seq[(Long, Seq[Int])] =
      // planted ladder: id j+10 is base with j bits flipped (j = 1..8,
      // straddling every radius boundary incl. one OUTSIDE the max)
      (1 to 8).map(j => (j + 10L, TestImages.flip(base, (0 until j).map(_ * 7): _*))) ++
        // background: independent random patterns (far apart whp)
        (30 to 45).map(i => (i.toLong, Seq.tabulate(64)(_ => rnd.nextInt(2)))) :+
        ((10L, base)) :+ ((25L, base)) // an identical pair (hamming 0)
    val df = patterns.map { case (id, bits) => (id, TestImages.bmpOfBits(bits)) }
      .toDF("id", "payload")
    def hamming(a: Seq[Int], b: Seq[Int]): Int =
      a.lazyZip(b).count { case (x, y) => x != y }
    for (k <- Seq(0, 2, 5, 7)) {
      val expected = (for {
        Seq((ia, pa), (ib, pb)) <- patterns.sortBy(_._1).combinations(2)
        if hamming(pa, pb) <= k
      } yield (ia, ib)).toSet
      val got = Multimodal.dHashNearDuplicates(
          df, $"id", $"payload", maxHamming = k)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"radius $k: missing=${expected -- got} spurious=${got -- expected}")
    }
  }

  // ------------------------------------------- real audio (javax.sound)

  /** Real WAV bytes via the JDK's own encoder: 16-bit PCM, `chans`
    * channels, sample generator per (channel, index).
    */
  private def wavBytes(rate: Float, chans: Int, n: Int,
      gen: (Int, Int) => Int, bigEndian: Boolean = false): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, rate, 16, chans, 2 * chans, rate, bigEndian)
    val bytes = new Array[Byte](n * 2 * chans)
    for (i <- 0 until n; c <- 0 until chans) {
      val v = gen(c, i)
      val o = (i * chans + c) * 2
      if (bigEndian) { bytes(o) = (v >> 8).toByte; bytes(o + 1) = v.toByte }
      else { bytes(o) = v.toByte; bytes(o + 1) = (v >> 8).toByte }
    }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavDecoder decodes real PCM: constant frames give exact RMS") {
    import spark.implicits._
    // 8 windows × 25 samples, window w holds constant amplitude 100(w+1):
    // RMS of a constant window IS the amplitude, exactly
    val wav = wavBytes(8000f, 1, 200, (_, i) => (i / 25 + 1) * 100)
    val df = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.decodeFeatures(df, "payload", Multimodal.WavDecoder())
      .select($"media_id", $"feat", $"dec_width", $"dec_height")
      .as[(Long, Seq[Float], Int, Int)].collect().sortBy(_._1).toSeq
    assert(got(0)._3 == 8000 && got(0)._4 == 200)
    assert(got(0)._2 == (1 to 8).map(_ * 100f))
    // corrupt payload: zero envelope, 0 Hz
    assert(got(1)._3 == 0 && got(1)._2.forall(_ == 0f))
  }

  test("WavDecoder reads the FIRST channel of stereo and negative samples") {
    // stereo: channel 0 carries ±300 square (RMS 300), channel 1 loud
    // noise that must NOT leak into the envelope
    val wav = wavBytes(16000f, 2, 160,
      (c, i) => if (c == 0) (if (i % 2 == 0) 300 else -300) else 30000)
    val (feat, rate, n) = Multimodal.WavDecoder().decodeBatch(Seq(wav)).head
    assert(rate == 16000 && n == 160)
    assert(feat.forall(f => math.abs(f - 300f) < 1e-3), feat.mkString(","))
  }

  test("WavDecoder rejects unsupported depths instead of mis-decoding") {
    // 8-bit PCM is outside the 16-bit contract → zero fallback
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 8, 1, true, false)
    val bytes = Array.fill(100)(42.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, 100L),
      AudioFileFormat.Type.WAVE, bos)
    val (feat, rate, _) = Multimodal.WavDecoder().decodeBatch(Seq(bos.toByteArray)).head
    assert(rate == 0 && feat.forall(_ == 0f))
  }

  // ------------------------------------------- media_meta (durations)

  test("media_meta parses mvhd v0 AND v1, avi, and REAL encoder WAV bytes") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def be32(v: Long) = f"$v%08X"
    def be64(v: Long) = f"$v%016X"
    def le32(v: Long) = {
      val s = f"$v%08X"
      s.substring(6, 8) + s.substring(4, 6) + s.substring(2, 4) + s.substring(0, 2)
    }
    // mvhd v0: ts 600, dur 90000 → 150000 ms
    val mp4v0 = hx("00000010" + "6674797069736F6D00000200" +
      "00000074" + "6D6F6F76" + "0000006C" + "6D766864" +
      "00000000" + "00000000" + "00000000" + be32(600) + be32(90000) + "00" * 80)
    // mvhd v1: 64-bit times; ts 1000, dur 2^32+500 → floor((2^32+500)/1)... /1000*1000
    val durV1 = (1L << 32) + 500L
    val mp4v1 = hx("00000010" + "6674797069736F6D00000200" +
      be32(8 + 120) + "6D6F6F76" + be32(120) + "6D766864" +
      "01000000" + be64(0) + be64(0) + be32(1000) + be64(durV1) + "00" * 76)
    // a preceding free box before moov must be skipped by size
    val mp4Skip = hx("00000010" + "6674797069736F6D00000200" +
      "00000018" + "66726565" + "00" * 16 + // 24-byte free box
      "00000074" + "6D6F6F76" + "0000006C" + "6D766864" +
      "00000000" + "00000000" + "00000000" + be32(500) + be32(1000) + "00" * 80)
    val avi = hx("52494646" + le32(80) + "41564920" + "4C495354" + le32(68) +
      "6864726C" + "61766968" + le32(56) + le32(40000) + "00" * 12 +
      le32(250) + "00" * 36)
    // REAL wav bytes from the JDK encoder: 8000 samples at 8 kHz = 1000 ms
    val wav = wavBytes(8000f, 1, 8000, (_, i) => i % 100)
    val cases = Seq(
      (1L, mp4v0, ("mp4", Some(150000L))),
      (2L, mp4v1, ("mp4", Some(durV1 * 1000L / 1000L))),
      (3L, mp4Skip, ("mp4", Some(2000L))),
      (4L, avi, ("avi", Some(40000L * 250 / 1000))),
      (5L, wav, ("wav", Some(1000L))),
      (6L, "not media at all".getBytes("UTF-8"), ("unknown", None)),
      (7L, java.util.Arrays.copyOf(mp4v0, 30), ("unknown", None)), // truncated
      (8L, java.util.Arrays.copyOf(avi, 20), ("unknown", None)))
    val df = cases.map(c => (c._1, c._2)).toDF("id", "payload")
    val got = df.select($"id",
        org.apache.spark.sql.graft.MediaMetaExpr.mediaMeta($"payload").as("m"))
      .select($"id", $"m.format", $"m.duration_ms")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == cases.map(c => (c._1, c._3._1, c._3._2)),
      s"got $got")
  }

  // ------------------------- dHash scale guards (pre-collapse + cap)

  import TestImages.bmpOfBits

  test("dHash pre-collapse: identical-image flood yields the full pair set") {
    import spark.implicits._
    // 300 byte-identical flat images (the solid-color placeholder case:
    // gradient signs all zero) — one representative enters the band
    // join; the output must still contain every C(300,2) intra pair —
    // plus one planted near-dup pair far from the flood
    val flat = bmpOfBits(Seq.fill(64)(0))
    val x = Seq.tabulate(64)(i => i % 2) // alternating — hamming 32 from flat
    val y = x.updated(10, 1 - x(10))     // hamming 1 from x
    val rows = (1L to 300L).map((_, flat)) ++
      Seq((301L, bmpOfBits(x)), (302L, bmpOfBits(y)))
    val got = Multimodal.dHashNearDuplicates(
        rows.toDF("id", "payload"), $"id", $"payload", maxHamming = 6)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.size == 300 * 299 / 2 + 1)
    assert(got.contains((301L, 302L, 1)))
    assert(got.filter(_._3 == 0).size == 300 * 299 / 2)
    // invariance against brute force over the decoded hashes
    val hashes = rows.map { case (i, p) =>
      val (feat, w, _) = Multimodal.ImageIODecoder().decodeBatch(Seq(p)).head
      assert(w == 9)
      val bits = for (yy <- 0 until 8; xx <- 0 until 8)
        yield if (feat(yy * 9 + xx + 1) > feat(yy * 9 + xx)) 1 else 0
      (i, bits)
    }
    val brute = (for {
      (ia, ba) <- hashes; (ib, bb) <- hashes if ia < ib
      h = ba.zip(bb).count(p => p._1 != p._2) if h <= 6
    } yield (ia, ib, h)).toSet
    assert(got == brute)
  }

  test("dHash bucket-quantile cap is one-sided and kills hot buckets") {
    import spark.implicits._
    // X and Y: hamming 6 spread over bands 1..6 (equal in bands 0 and 7);
    // six fillers each flip one ENTIRE mid band (hamming 8 from X — never
    // a pair), making every shared bucket hot
    val xBits = Seq.tabulate(64)(i => if (i % 3 == 0) 1 else 0)
    val yBits = (1 to 6).foldLeft(xBits)((b, band) =>
      b.updated(band * 8 + 3, 1 - b(band * 8 + 3)))
    val fillers = (0 until 6).map { k =>
      (10L + k, bmpOfBits(Seq.tabulate(64)(i =>
        if (i / 8 == k + 1) 1 - xBits(i) else xBits(i))))
    }
    val rows = Seq((1L, bmpOfBits(xBits)), (2L, bmpOfBits(yBits))) ++ fillers
    def run(cap: Option[Double]) = Multimodal.dHashNearDuplicates(
        rows.toDF("id", "payload"), $"id", $"payload", maxHamming = 6,
        maxBandBucketQuantile = cap)
      .as[(Long, Long, Int)].collect().toSet
    val uncapped = run(None)
    assert(uncapped == Set((1L, 2L, 6)))
    val capped = run(Some(0.1)) // cap below every hot bucket's size
    assert(capped.subsetOf(uncapped), "cap must never add pairs")
    assert(capped.isEmpty, "every candidate bucket was hot; cap drops them all")
  }
}
