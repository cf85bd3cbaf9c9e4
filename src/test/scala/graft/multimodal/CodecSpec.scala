package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The pluggable-Codec seam with the pure-JVM netpbm implementation: the
  * parser handles real headers (comments, P5/P6, malformed input) and the
  * decode pass carries actual raster bytes through the DataFrame plumbing. */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def p6(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  test("P6 parse: dims, channels, raster bytes") {
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 7).toByte)
    val img = PpmCodec.decode(p6(2, 3, px))
    assert(img.width == 2 && img.height == 3 && img.channels == 3)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("P5 parse with comments and tab/space separators") {
    val payload = "P5 # grayscale\n# a comment line\n4\t2 # dims\n255\n"
      .getBytes("US-ASCII") ++ Array.tabulate(8)(_.toByte)
    val img = PpmCodec.decode(payload)
    assert(img.width == 4 && img.height == 2 && img.channels == 1)
    assert(img.pixels.length == 8)
  }

  test("trailing bytes beyond the raster are ignored, truncation is fatal") {
    val px = Array.fill(3)(1.toByte)
    assert(PpmCodec.decode(p6(1, 1, px ++ Array[Byte](9, 9))).pixels.toSeq == px.toSeq)
    val e = intercept[IllegalArgumentException] {
      PpmCodec.decode(p6(2, 2, px)) // needs 12 bytes, has 3
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("non-netpbm payloads fail with a clear error") {
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode("JFIF....".getBytes("US-ASCII"))
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode("P3\n1 1\n255\n1 2 3".getBytes("US-ASCII")) // ASCII ppm
    }.getMessage.contains("P5/P6"))
  }

  test("maxval > 255 (16-bit samples) is rejected, not silently misread") {
    val bad = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ Array.fill(6)(0.toByte)
    assert(intercept[IllegalArgumentException] {
      PpmCodec.decode(bad)
    }.getMessage.contains("maxval"))
  }

  test("generator → decodeImages roundtrip: real pixels flow through the seam") {
    val docs = spark.createDataFrame(Seq(
      (0L, ""), // 1x1 black
      (1L, "abc"), // w=4, h=1, pixels cycle a,b,c,a,...
      (2L, "x" * 20) // w=5, h=2
    )).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImages(
      Multimodal.ppmAssetsFromDocuments(docs, "doc_id", "text"), PpmCodec)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r0 = decoded(0L)
    assert(r0.getInt(1) == 1 && r0.getInt(2) == 1 && r0.getInt(3) == 3)
    assert(r0.getLong(4) == 0L)

    val r1 = decoded(1L)
    assert(r1.getInt(1) == 4 && r1.getInt(2) == 1)
    val expected1 = Array.tabulate(12)(i => "abc".charAt(i % 3).toByte)
    assert(r1.getAs[Array[Byte]](5).toSeq == expected1.toSeq)
    assert(r1.getLong(4) == expected1.map(_ & 0xff).sum.toLong)

    val r2 = decoded(2L)
    assert(r2.getInt(1) == 5 && r2.getInt(2) == 2)
    assert(r2.getLong(4) == 5L * 2 * 3 * 'x'.toInt)
  }

  test("formats the codec does not claim are excluded before decode") {
    val docs = spark.createDataFrame(Seq((0L, "abc"))).toDF("doc_id", "text")
    // assetsFromDocuments emits jpeg/wav/mp4 formats — PpmCodec claims none
    val mixed = Multimodal.assetsFromDocuments(docs, "doc_id", "text")
    assert(Multimodal.decodeImages(mixed, PpmCodec).count() == 0)
  }

  test("WavCodec: the chunk walk parses a handcrafted RIFF payload to known samples") {
    // 4 samples, little-endian 16-bit mono @ 8 kHz — built by hand here
    // (not by the generator) so the decoder is tested against the SPEC,
    // not against the code that feeds it in production
    val samples = Seq[Short](0, 512, -16384, 32767)
    val bb = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(8)
    samples.foreach(bb.putShort)
    val a = WavCodec.decode(bb.array())
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == samples.map(_.toInt))
  }

  test("WavCodec: garbage payloads fail loudly, not as zero samples") {
    intercept[Exception](WavCodec.decode("not a wav".getBytes("US-ASCII")))
  }

  test("WavCodec: unknown chunks skip word-aligned, data-before-fmt rejects") {
    // a LIST chunk with an ODD size between fmt and data — the walk must
    // honor RIFF word alignment (pad byte) to land on the data fourcc
    val samples = Seq[Short](100, -200)
    val odd = 5
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 8 + odd + 1 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(24 + 8 + odd + 1 + 8 + 4)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(odd)
      .put(Array.fill[Byte](odd + 1)(0x7f)) // odd payload + pad byte
      .put("data".getBytes("US-ASCII")).putInt(4)
    samples.foreach(bb.putShort)
    val a = WavCodec.decode(bb.array())
    assert(a.samples.toSeq == samples.map(_.toInt))

    // data chunk arriving before any fmt chunk must reject: without the
    // fmt geometry the PCM bytes are uninterpretable
    val bad = java.nio.ByteBuffer.allocate(12 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put("RIFF".getBytes("US-ASCII")).putInt(8 + 4)
      .put("WAVE".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(1).putShort(2)
    intercept[IllegalArgumentException](WavCodec.decode(bad.array()))
  }

  test("generator → decodeAudioStats roundtrip: silence runs from real text") {
    val docs = spark.createDataFrame(Seq(
      (0L, ""),          // 1 sample, amp 0 → silence run 1
      (1L, "aa   bb"),   // len 7 → 8 samples cycling the text
      (2L, "q")          // len 1 → 2 samples, both 'q'
    )).toDF("doc_id", "text")
    val stats = Multimodal.decodeAudioStats(
      Multimodal.wavAssetsFromDocuments(docs, "doc_id", "text"), WavCodec)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r0 = stats(0L)
    assert(r0.getInt(3) == 1 && r0.getLong(4) == 0L && r0.getInt(6) == 1)

    // doc 1: samples cycle "aa   bb" then wrap to 'a' — amp('a') =
    // (97%64-32)*512 = 512, amp(' ') = 0, amp('b') = 1024; the three
    // spaces are the longest silence run
    val r1 = stats(1L)
    assert(r1.getInt(1) == 8000 && r1.getInt(2) == 1)
    assert(r1.getInt(3) == 8)
    assert(r1.getLong(4) == 512L + 512 + 0 + 0 + 0 + 1024 + 1024 + 512)
    assert(r1.getInt(5) == 1024)
    assert(r1.getInt(6) == 3)

    val r2 = stats(2L)
    assert(r2.getInt(3) == 2 && r2.getInt(6) == 0)
    assert(r2.getLong(4) == 2L * ((('q'.toInt % 64) - 32) * 512).abs)
  }

  test("ImageIoCodec: PNG round-trips the raster losslessly at every size") {
    val docs = spark.createDataFrame(Seq(
      (0L, ""),                 // 1x1 black
      (1L, "abc"),              // 4x1
      (2L, "The quick brown fox jumps over the lazy dog"), // 12x3
      (3L, "z" * 255)           // 16x16
    )).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImages(
      Multimodal.pngAssetsFromDocuments(docs, "doc_id", "text"), ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- Seq(0L -> "", 1L -> "abc",
        2L -> "The quick brown fox jumps over the lazy dog", 3L -> "z" * 255)) {
      val len = text.length
      val (w, h) = (1 + len % 16, 1 + (len / 16) % 16)
      val expected = Array.tabulate(w * h * 3)(i =>
        if (len == 0) 0.toByte else text.charAt(i % len).toByte)
      val r = decoded(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == 3)
      assert(r.getAs[Array[Byte]](5).toSeq == expected.toSeq,
        s"doc $id: PNG decode differs from constructed raster")
    }
  }

  test("ImageIoCodec: a handcrafted BMP decodes to known pixels") {
    // built via the JDK encoder from a raster defined HERE (not by the
    // production generator), then decoded — spec-vs-spec like the WAV test
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0x808080)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bo)
    val out = ImageIoCodec.decode(bo.toByteArray)
    assert(out.width == 2 && out.height == 2 && out.channels == 3)
    assert(out.pixels.map(_ & 0xff).toSeq == Seq(
      255, 0, 0,  0, 255, 0,
      0, 0, 255,  128, 128, 128))
  }

  test("ImageIoCodec: undecodable payloads fail loudly") {
    intercept[IllegalArgumentException](
      ImageIoCodec.decode("not an image".getBytes("US-ASCII")))
  }

  test("JPEG: dims/channels exact, pixel error bounded (lossy contract)") {
    val text = "Sphinx of black quartz, judge my vow. " * 3 // len 114 → 3x8
    val docs = spark.createDataFrame(Seq((7L, text))).toDF("doc_id", "text")
    val decoded = Multimodal.decodeImages(
      Multimodal.jpegAssetsFromDocuments(docs, "doc_id", "text"), ImageIoCodec)
      .collect().head
    val len = text.length
    val (w, h) = (1 + len % 16, 1 + (len / 16) % 16)
    assert(decoded.getInt(1) == w && decoded.getInt(2) == h &&
      decoded.getInt(3) == 3)
    val expected = Array.tabulate(w * h * 3)(i => text.charAt(i % len).toInt)
    val got = decoded.getAs[Array[Byte]](5).map(_ & 0xff)
    val meanErr = expected.zip(got).map { case (a, b) => (a - b).abs }.sum /
      expected.length.toDouble
    // ASCII-noise rasters are the worst case for DCT quantization; the
    // JDK's default-quality encoder measures ~21 mean abs error on them.
    // The bound asserts the decode is a real DCT reconstruction (error
    // far below random-bytes ~85) without over-fitting the encoder.
    assert(meanErr < 48.0, f"JPEG mean abs pixel error $meanErr%.1f")
  }

  test("GifCodec: frame count, order, and pixels decode exactly") {
    val text = "animated gif frames!" // len 20 → w=5, h=2, nf=3
    val docs = spark.createDataFrame(Seq((9L, text), (10L, "")))
      .toDF("doc_id", "text")
    val rows = Multimodal.decodeFrameStats(
      Multimodal.gifAssetsFromDocuments(docs, "doc_id", "text"), GifCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    val len = text.length
    assert(rows.keySet == Set((9L, 0), (9L, 1), (9L, 2), (10L, 0)),
      "frame fan-out must follow 1 + len%6")
    for (f <- 0 until 3) {
      val r = rows((9L, f))
      assert(r.getInt(2) == 5 && r.getInt(3) == 2)
      val want = 3L * (0 until 10).map(i => text.charAt((i + f * 7) % len).toInt).sum
      assert(r.getLong(4) == want, s"frame $f px_sum")
    }
    assert(rows((10L, 0)).getLong(4) == 0L)
  }

  test("GIF heights 2..4 survive because frames are written non-interlaced") {
    // regression pin for the JDK pair bug this codec documents: the GIF
    // writer's default INTERLACED output loses rows 1..h-1 at heights
    // 2..4 through the JDK reader. The generator writes MODE_DISABLED;
    // this drives a worst-case-height corpus through the full path and
    // cross-checks decoded px_sum against the construction arithmetic.
    val cases = Seq(
      (20L, "abcdefghijklmnopq" * 2), // len 34 → w=3, h=3 (buggy zone)
      (21L, "0123456789abcdef" * 3)   // len 48 → w=1, h=4 (buggy zone)
    )
    val docs = spark.createDataFrame(cases).toDF("doc_id", "text")
    val rows = Multimodal.decodeFrameStats(
      Multimodal.gifAssetsFromDocuments(docs, "doc_id", "text"), GifCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    for ((id, text) <- cases; f <- 0 until (1 + text.length % 6)) {
      val len = text.length
      val (w, h) = (1 + len % 16, 1 + (len / 16) % 16)
      assert(h >= 2 && h <= 4, s"case $id must sit in the buggy height zone, got h=$h")
      val want = 3L * (0 until w * h)
        .map(i => text.charAt((i + f * 7) % len).toInt).sum
      assert(rows((id, f)) == want,
        s"doc $id frame $f: interlace bug would zero rows 1..${h - 1}")
    }
  }

  test("audioFingerprints: polarity bits from decoded PCM, short clips dropped") {
    // len 38 → n = 39 samples: long enough; len 3 → n = 4: dropped.
    // 'a' (code 97) → amp +512 → bit set; ' ' → 0 → clear; 'p' (112) →
    // 112%64-32 = 16 → positive; 'A' (65) → 65%64-32 = -31 → negative.
    val longText = ("a" * 10) + " " + ("A" * 27) // len 38
    val docs = spark.createDataFrame(Seq(
      (1L, longText),
      (2L, "abc") // n = 4 < 32: dropped
    )).toDF("doc_id", "text")
    val fps = Multimodal.audioFingerprints(
      Multimodal.wavAssetsFromDocuments(docs, "doc_id", "text"),
      WavCodec, minSamples = 32).collect()
    assert(fps.map(_.getLong(0)).toSet == Set(1L), "short clip must be dropped")
    val r = fps.head
    val fp = (r.getLong(1) << 32) | r.getLong(2)
    // expected: clip has n = 39 samples (chars cycled from the 38-char
    // text); the fingerprint cycles the polarity sequence densely over
    // all 62 bits — bit i = sign of sample (i mod 39)
    val expected = (0 until 62).foldLeft(0L) { (acc, i) =>
      val c = longText.charAt((i % 39) % 38)
      if ((c.toInt % 64 - 32) > 0) acc | (1L << i) else acc
    }
    assert(fp == expected, f"fp=0x$fp%016x expected=0x$expected%016x")
  }

  test("PngChunks: inject then strip restores the original bytes exactly") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, x * 37 + y * 101)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bo)
    val base = bo.toByteArray
    val injected = PngChunks.injectText(base,
      Seq("Author" -> "user-1-0", "Comment" -> "gps 1.2,3.4"))
    assert(injected.length > base.length)
    // the injected payload still decodes (readers skip unknown ancillary)
    assert(ImageIoCodec.decode(injected).pixels.toSeq ==
      ImageIoCodec.decode(base).pixels.toSeq)
    val (clean, nText) = PngChunks.stripAncillary(injected)
    assert(nText == 2, s"expected 2 tEXt dropped, got $nText")
    // strip removes ONLY ancillary chunks: if the encoder wrote none, the
    // scrub restores the original byte-for-byte (image stream untouched)
    val (baseClean, baseText) = PngChunks.stripAncillary(base)
    assert(baseText == 0)
    assert(clean.toSeq == baseClean.toSeq)
    assert(ImageIoCodec.decode(clean).pixels.toSeq ==
      ImageIoCodec.decode(base).pixels.toSeq)
    // no tEXt survives in the scrubbed bytes
    val marker = "tEXt".getBytes("US-ASCII").toSeq
    assert(!clean.toSeq.sliding(4).contains(marker))
  }

  test("resample floor-average: floorDiv semantics on negative pair sums") {
    // (-512 + -513) = -1025 → floorDiv = -513 (truncation would give
    // -512, silently diverging from the oracle's // on exactly the
    // clips that contain odd negative pair sums)
    assert(Math.floorDiv(-1025, 2) == -513)
    assert(Math.floorDiv(1025, 2) == 512)
    // end-to-end on a hand-built clip: samples from the fixture formula
    val samples = Array(-16384, 15872, -512, -513, 7)
    val pairs = (0 until samples.length / 2)
      .map(k => Math.floorDiv(samples(2 * k) + samples(2 * k + 1), 2))
    assert(pairs == Seq(-256, -513)) // odd tail (7) dropped
  }

  test("JpegSegments: inject then strip restores the original bytes exactly") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5) img.setRGB(x, y, x * 37 + y * 101)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bo)
    val base = bo.toByteArray
    val injected = JpegSegments.injectMeta(base,
      Seq("user-1-0", "gps 1.2,3.4"), Seq("crawler note"))
    assert(injected.length > base.length)
    // the injected payload still decodes (readers skip unknown APPn/COM)
    assert(ImageIoCodec.decode(injected).pixels.toSeq ==
      ImageIoCodec.decode(base).pixels.toSeq)
    val (clean, nApp1, nCom) = JpegSegments.stripMeta(injected)
    assert(nApp1 == 2, s"expected 2 APP1 dropped, got $nApp1")
    assert(nCom == 1, s"expected 1 COM dropped, got $nCom")
    // stripping is lossless even though the codec is not: the JDK encoder
    // writes no APP1/COM of its own, so the scrub restores the original
    // byte-for-byte (entropy-coded stream untouched)
    val (baseClean, baseApp1, baseCom) = JpegSegments.stripMeta(base)
    assert(baseApp1 == 0 && baseCom == 0)
    assert(clean.toSeq == baseClean.toSeq)
    assert(clean.toSeq == base.toSeq)
    // no EXIF identifier survives in the scrubbed bytes
    val marker = "Exif".getBytes("US-ASCII").toSeq
    assert(!clean.toSeq.sliding(4).contains(marker))
  }
}
