package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The RIFF-AVI container walk: geometry from strf, byte-exact DIB frame
  * decode (bottom-up BGR + stride padding → top-down RGB), multi-frame
  * order, and the lossy MJPEG '00dc' path via imageio. */
class AviCodecSpec extends AnyFunSuite {

  /** Hand-assembled minimal AVI (mirrors Multimodal.buildDibAvi but kept
    * independent in the test, so a builder bug cannot hide a parser bug). */
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def avi(w: Int, h: Int, frames: Seq[Array[Byte]],
                  frameId: String = "00db"): Array[Byte] = {
    val strf = fcc("strf") ++ le32(40) ++ le32(40) ++ le32(w) ++ le32(h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("strh") ++ le32(56) ++ fcc("vids") ++ fcc("DIB ") ++
      Array.fill(48)(0.toByte)
    val strlBody = fcc("strl") ++ strh ++ strf
    val strl = fcc("LIST") ++ le32(strlBody.length) ++ strlBody
    val avih = fcc("avih") ++ le32(56) ++ Array.fill(56)(0.toByte)
    val hdrlBody = fcc("hdrl") ++ avih ++ strl
    val hdrl = fcc("LIST") ++ le32(hdrlBody.length) ++ hdrlBody
    val frameChunks = frames.flatMap { fb =>
      val pad = if (fb.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(frameId) ++ le32(fb.length) ++ fb ++ pad
    }.toArray
    val moviBody = fcc("movi") ++ frameChunks
    val movi = fcc("LIST") ++ le32(moviBody.length) ++ moviBody
    val riffBody = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  /** DIB frame bytes for a top-down RGB raster given as (r,g,b) per px. */
  private def dib(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val off = (h - 1 - y) * stride + x * 3 // bottom-up
      out(off) = b.toByte; out(off + 1) = g.toByte; out(off + 2) = r.toByte
    }
    out
  }

  test("DIB decode: distinct B/G/R channels, bottom-up flip, exact bytes") {
    val w = 3; val h = 2
    def px(x: Int, y: Int) = (10 * (y * w + x) + 1, 10 * (y * w + x) + 2,
      10 * (y * w + x) + 3)
    val img = AviCodec.decodeFrames(avi(w, h, Seq(dib(w, h, px)))).head
    assert(img.width == w && img.height == h && img.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      val (r, g, b) = px(x, y)
      assert((img.pixels(base) & 0xff) == r, s"R at ($x,$y)")
      assert((img.pixels(base + 1) & 0xff) == g, s"G at ($x,$y)")
      assert((img.pixels(base + 2) & 0xff) == b, s"B at ($x,$y)")
    }
  }

  test("stride padding: widths 1..5 all round-trip") {
    for (w <- 1 to 5) {
      val h = 3
      def px(x: Int, y: Int) = { val v = (x * 31 + y * 7) % 256; (v, v, v) }
      val img = AviCodec.decodeFrames(avi(w, h, Seq(dib(w, h, px)))).head
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.pixels((y * w + x) * 3) & 0xff) == (x * 31 + y * 7) % 256,
          s"w=$w ($x,$y)")
    }
  }

  test("multi-frame order is the container chunk order") {
    val w = 2; val h = 2
    val frames = (0 until 4).map(f => dib(w, h, (_, _) => (f * 50, f * 50, f * 50)))
    val out = AviCodec.decodeFrames(avi(w, h, frames))
    assert(out.length == 4)
    out.zipWithIndex.foreach { case (img, f) =>
      assert((img.pixels(0) & 0xff) == f * 50, s"frame $f")
    }
  }

  test("builder → codec round-trip matches the GIF pixel recipe") {
    val text = "the quick brown fox jumps over the lazy dog"
    val len = text.length
    val w = 1 + len % 16; val h = 1 + (len / 16) % 16; val nf = 1 + len % 6
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val assets = Multimodal.aviAssetsFromDocuments(
      Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val payload = assets.collect().head.getAs[Array[Byte]]("payload")
    val frames = AviCodec.decodeFrames(payload)
    assert(frames.length == nf)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = text.charAt((y * w + x + f * 7) % len).toInt & 0xff
        assert((img.pixels((y * w + x) * 3) & 0xff) == expect,
          s"frame $f ($x,$y)")
      }
    }
  }

  test("MJPEG '00dc' frames decode via imageio (lossy — dims only)") {
    val w = 8; val h = 6
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, 0x808080)
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpeg", bo)
    val out = AviCodec.decodeFrames(avi(w, h, Seq(bo.toByteArray), "00dc"))
    assert(out.length == 1)
    assert(out.head.width == w && out.head.height == h && out.head.channels == 3)
  }

  test("malformed payloads are rejected with clear errors") {
    intercept[IllegalArgumentException](AviCodec.decodeFrames("nope".getBytes))
    intercept[IllegalArgumentException](
      AviCodec.decodeFrames(avi(2, 2, Seq(Array[Byte](1, 2, 3))))) // truncated DIB
  }
}
