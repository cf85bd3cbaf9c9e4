package graft.multimodal

/** Pluggable media-codec seam for the multimodal column pipeline.
  *
  * `Multimodal`'s decode/resize/embed stubs exercise the Spark-side
  * plumbing (binary columns, per-partition batches, typed output schemas);
  * this trait is where a real decoder plugs in. Implementations must be
  * Serializable — the instance is closure-captured and shipped to
  * executors, decoding payload batches per partition (the same placement a
  * JNI/FFI image library or a mapInPandas Pillow worker would have).
  *
  * [[PpmCodec]] is a complete pure-JVM implementation (netpbm P5/P6 —
  * public spec, no native libs needed in this sandbox), proving the seam
  * carries real decoded pixels end to end: see `MultimodalOps` `m_codec`,
  * which is hash-checked against the DuckDB oracle like any other query.
  */
trait Codec extends Serializable {

  /** Lower-case format tags this codec accepts (matched against the asset
    * table's `format` column). */
  def formats: Set[String]

  /** Decode one payload. Throws IllegalArgumentException on malformed
    * input — the caller decides whether to fail the task or route the
    * asset to a quarantine output. */
  def decode(payload: Array[Byte]): Codec.Image
}

object Codec {
  /** A decoded raster: `pixels` is row-major, `channels` bytes per pixel
    * (1 = grayscale, 3 = RGB), 8 bits per sample. */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  /** A decoded PCM clip: `samples` is frame-major (interleaved channels),
    * one Int per 16-bit sample, sign-extended. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Int])
}

/** The audio half of the codec seam — same contract as [[Codec]] but for
  * PCM clips. [[WavCodec]] is the reference implementation. */
trait AudioCodec extends Serializable {
  def formats: Set[String]
  def decode(payload: Array[Byte]): Codec.Audio
}

/** RIFF/WAVE PCM decode via a direct chunk walk (RIFF spec: 'RIFF' +
  * u32le size + 'WAVE', then fourcc + u32le size + payload chunks,
  * word-aligned — the identical grammar [[AviCodec]] walks for video).
  * The fmt chunk carries audioFormat/channels/sampleRate/bitsPerSample;
  * the data chunk carries the interleaved little-endian PCM frames.
  *
  * History: rounds 8-11 decoded through `javax.sound.sampled.AudioSystem
  * .getAudioInputStream`, whose per-payload SERVICE-PROVIDER LOOKUP takes
  * a JVM-global lock — contention that compounds with rows × 32 executor
  * threads and made the four m_wav_* queries the round-11 inventory's
  * only measured superlinearity (m_wav_stats 16.4× on 10× data). The
  * direct walk is lock-free and allocation-minimal; output is
  * byte-identical (hash-gated by all four m_wav_* oracles and the
  * CodecSpec round-trips). 16-bit signed PCM only (the format the asset
  * builder emits), same contract as before. */
object WavCodec extends AudioCodec {

  override val formats: Set[String] = Set("wav")

  private def u32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  override def decode(payload: Array[Byte]): Codec.Audio = {
    require(payload.length >= 12 && fcc(payload, 0) == "RIFF" &&
      fcc(payload, 8) == "WAVE", "not a RIFF/WAVE payload")
    var audioFormat = -1; var channels = 0; var sampleRate = 0
    var bits = 0
    var dataOff = -1; var dataLen = 0
    var p = 12
    while (p + 8 <= payload.length && dataOff < 0) {
      val id = fcc(payload, p)
      val size = u32(payload, p + 4)
      val body = p + 8
      require(size >= 0 && body + size <= payload.length,
        s"truncated RIFF chunk '$id' at $p")
      if (id == "fmt ") {
        require(size >= 16, s"fmt chunk too short ($size bytes)")
        audioFormat = u16(payload, body)
        channels = u16(payload, body + 2)
        sampleRate = u32(payload, body + 4)
        bits = u16(payload, body + 14)
      } else if (id == "data") {
        require(audioFormat >= 0, "data chunk before fmt chunk")
        dataOff = body; dataLen = size
      }
      p = body + size + (size & 1) // chunks are word-aligned
    }
    require(dataOff >= 0, "no data chunk in WAVE payload")
    require(audioFormat == 1,
      s"unsupported encoding code $audioFormat (want 1 = 16-bit signed PCM)")
    require(bits == 16, s"unsupported sample size $bits (want 16)")
    val n = dataLen / 2
    val samples = new Array[Int](n)
    var i = 0
    while (i < n) {
      val b0 = payload(dataOff + 2 * i) & 0xff
      val b1 = payload(dataOff + 2 * i + 1) & 0xff
      samples(i) = ((b1 << 8) | b0).toShort.toInt // WAV PCM is always LE
      i += 1
    }
    Codec.Audio(sampleRate, channels, samples)
  }
}

/** The video half of the codec seam: a multi-frame payload decodes to an
  * ordered frame sequence. [[GifCodec]] is the reference implementation
  * (animated GIF — the one multi-frame container the JDK decodes without
  * native libs; MP4/H.264 remain out of scope, no demuxer in the JDK). */
trait FrameCodec extends Serializable {
  def formats: Set[String]
  def decodeFrames(payload: Array[Byte]): IndexedSeq[Codec.Image]
}

/** Shared `javax.imageio` plumbing for the JDK's pure-Java image codecs
  * (PNG/JPEG/BMP/GIF readers and writers ship in every JDK — no native
  * libs, headless-safe, same situation as `javax.sound` for WAV). */
private[multimodal] object ImageIoSupport {
  // memory-backed ImageInputStreams: the default file-cache would hit
  // executor-local disk per payload for no benefit at our payload sizes
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded BufferedImage → the seam's packed RGB byte raster. getRGB
    * normalizes every source color model (indexed, gray, 3BYTE_BGR) to
    * sRGB ints, so one conversion covers all four formats. */
  def toRgbBytes(img: java.awt.image.BufferedImage): Codec.Image = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val i = (y * w + x) * 3
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Codec.Image(w, h, 3, out)
  }
}

/** PNG/JPEG/BMP decode via the JDK's `javax.imageio` service registry —
  * real DEFLATE (PNG) and DCT (JPEG) codecs, pure JVM. Output is always
  * normalized to 3-channel packed RGB regardless of the file's native
  * color model. PNG round-trips losslessly (hash-gated in `m_png_codec`);
  * JPEG decode is real but lossy, so only its lossless invariants
  * (dimensions, channel count) are oracle-checked (`m_jpeg_meta`) and the
  * pixel fidelity bound lives in CodecSpec. */
object ImageIoCodec extends Codec {

  override val formats: Set[String] = Set("png", "jpeg", "jpg", "bmp")

  override def decode(payload: Array[Byte]): Codec.Image = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "imageio could not decode payload (no reader claimed it)")
    ImageIoSupport.toRgbBytes(img)
  }
}

/** Raw PNG chunk-grammar walk (ISO/IEC 15948 §5: 8-byte signature, then
  * length(4,BE) + type(4) + data + crc32(type‖data) chunks): the seam for
  * metadata-level operations the pixel codecs never see. Criticality is
  * the spec's bit-5 rule — an UPPERCASE first type letter (IHDR, PLTE,
  * IDAT, IEND) is critical; lowercase (tEXt, zTXt, iTXt, eXIf, tIME, …)
  * is ancillary and safe to drop without touching the image stream. */
object PngChunks {

  private val SigLen = 8

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** (offset, totalLen, type) for every chunk, signature excluded. */
  private def walk(png: Array[Byte]): IndexedSeq[(Int, Int, String)] = {
    require(png.length >= SigLen && (png(0) & 0xff) == 0x89,
      "not a PNG payload")
    val out = IndexedSeq.newBuilder[(Int, Int, String)]
    var off = SigLen
    while (off + 8 <= png.length) {
      val dataLen = be32(png, off)
      val tpe = new String(png, off + 4, 4, "US-ASCII")
      val total = 12 + dataLen
      out += ((off, total, tpe))
      off += total
    }
    out.result()
  }

  private def textChunk(keyword: String, value: String): Array[Byte] = {
    val data = keyword.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
      value.getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII"))
    crc.update(data)
    val bo = new java.io.ByteArrayOutputStream(12 + data.length)
    val dd = new java.io.DataOutputStream(bo)
    dd.writeInt(data.length)
    dd.write("tEXt".getBytes("US-ASCII"))
    dd.write(data)
    dd.writeInt(crc.getValue.toInt)
    bo.toByteArray
  }

  /** Splice tEXt metadata chunks immediately after IHDR (the spec's only
    * ordering constraint for tEXt is "after IHDR, before IEND"). */
  def injectText(png: Array[Byte], entries: Seq[(String, String)]): Array[Byte] = {
    val first = walk(png).head
    require(first._3 == "IHDR", s"first chunk must be IHDR, got ${first._3}")
    val cut = first._1 + first._2
    val bo = new java.io.ByteArrayOutputStream(png.length)
    bo.write(png, 0, cut)
    entries.foreach { case (k, v) => bo.write(textChunk(k, v)) }
    bo.write(png, cut, png.length - cut)
    bo.toByteArray
  }

  /** Drop every ancillary chunk; returns (scrubbed payload, #tEXt
    * dropped). The image stream (IHDR/PLTE/IDAT/IEND) passes through
    * byte-identical — PNG is lossless, so a decode of the result must
    * equal a decode of the original, which is exactly what the
    * m_strip_meta gate checks. */
  def stripAncillary(png: Array[Byte]): (Array[Byte], Int) = {
    val chunks = walk(png)
    val bo = new java.io.ByteArrayOutputStream(png.length)
    bo.write(png, 0, SigLen)
    var nText = 0
    chunks.foreach { case (off, total, tpe) =>
      val critical = (tpe.charAt(0) & 0x20) == 0
      if (critical) bo.write(png, off, total)
      else if (tpe == "tEXt") nText += 1
    }
    (bo.toByteArray, nText)
  }
}

/** Raw JPEG marker-segment walk (ITU-T T.81 §B: SOI, then FF-marker
  * segments each carrying a 2-byte big-endian length that includes
  * itself, until SOS — after which the entropy-coded stream runs to EOI
  * and is copied verbatim): the PngChunks seam for the lossy format.
  * Metadata lives in APPn (EXIF = APP1, ICC = APP2, … — where crawled
  * images carry GPS/author/timestamps) and COM segments; the image
  * stream (DQT/SOF/DHT/SOS/scan data) passes through byte-identical, so
  * although JPEG is lossy, STRIPPING is lossless — a decode of the
  * scrubbed payload must equal a decode of the original bit-for-bit,
  * which is exactly what the m_jpeg_strip gate checks. */
object JpegSegments {

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** (offset, totalLen, marker) for every segment after SOI up to and
    * excluding SOS; returns (segments, sosOffset). */
  private def walk(jpeg: Array[Byte]): (IndexedSeq[(Int, Int, Int)], Int) = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG payload")
    val out = IndexedSeq.newBuilder[(Int, Int, Int)]
    var off = 2
    while (off + 4 <= jpeg.length) {
      require((jpeg(off) & 0xff) == 0xff, s"expected marker at $off")
      val m = jpeg(off + 1) & 0xff
      if (m == 0xda) return (out.result(), off) // SOS: scan data follows
      val total = 2 + be16(jpeg, off + 2)
      out += ((off, total, m))
      off += total
    }
    (out.result(), jpeg.length)
  }

  private def segment(marker: Int, data: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream(4 + data.length)
    bo.write(0xff); bo.write(marker)
    val len = data.length + 2
    bo.write((len >> 8) & 0xff); bo.write(len & 0xff)
    bo.write(data, 0, data.length)
    bo.toByteArray
  }

  /** Splice APP1 (EXIF-shaped) and COM metadata segments immediately
    * after SOI — where EXIF actually sits in camera output. */
  def injectMeta(jpeg: Array[Byte], app1: Seq[String],
                 comments: Seq[String]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG payload")
    val bo = new java.io.ByteArrayOutputStream(jpeg.length)
    bo.write(jpeg, 0, 2)
    app1.foreach { v =>
      val d = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
        v.getBytes("ISO-8859-1")
      val s = segment(0xe1, d); bo.write(s, 0, s.length)
    }
    comments.foreach { v =>
      val s = segment(0xfe, v.getBytes("ISO-8859-1"))
      bo.write(s, 0, s.length)
    }
    bo.write(jpeg, 2, jpeg.length - 2)
    bo.toByteArray
  }

  /** Drop every APP1..APP15 and COM segment; APP0 (JFIF geometry) and the
    * whole image stream pass through byte-identical. Returns
    * (scrubbed payload, #APP1 dropped, #COM dropped). */
  def stripMeta(jpeg: Array[Byte]): (Array[Byte], Int, Int) = {
    val (segs, sos) = walk(jpeg)
    val bo = new java.io.ByteArrayOutputStream(jpeg.length)
    bo.write(jpeg, 0, 2)
    var nApp1 = 0
    var nCom = 0
    segs.foreach { case (off, total, m) =>
      val drop = (m >= 0xe1 && m <= 0xef) || m == 0xfe
      if (!drop) bo.write(jpeg, off, total)
      else if (m == 0xe1) nApp1 += 1
      else if (m == 0xfe) nCom += 1
    }
    bo.write(jpeg, sos, jpeg.length - sos)
    (bo.toByteArray, nApp1, nCom)
  }
}

/** Animated-GIF frame decode via the JDK's GIF plugin: the reader walks
  * the GIF89a block structure and LZW-decompresses each image descriptor;
  * `getNumImages(true)` scans the stream so multi-frame payloads fan out
  * to real per-frame rasters — the video modality's frame-sampling
  * primitive with a real container, not byte chunking.
  *
  * Encoder caveat (documented because the fixture builder must avoid it):
  * the JDK GIF WRITER defaults to interlaced output, and the JDK reader
  * drops every row after the first interlace pass for images of height
  * 2..4 (measured exhaustively: heights 1 and >=5 round-trip at any
  * width, heights 2..4 lose rows 1..h-1 at every width). Writing with
  * `ImageWriteParam.setProgressiveMode(MODE_DISABLED)` produces
  * non-interlaced frames that round-trip at every size — which is what
  * [[Multimodal.gifAssetsFromDocuments]] does. */
object GifCodec extends FrameCodec {

  override val formats: Set[String] = Set("gif")

  override def decodeFrames(payload: Array[Byte]): IndexedSeq[Codec.Image] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n > 0, "no frames in GIF payload")
      (0 until n).map(i => ImageIoSupport.toRgbBytes(reader.read(i)))
    } finally {
      reader.dispose()
      iis.close()
    }
  }
}

/** Netpbm binary formats: P6 (RGB, 3 channels) and P5 (grayscale, 1
  * channel). Header = magic, whitespace-separated width/height/maxval
  * with `#` comments allowed, ONE whitespace byte, then the raw raster.
  * Chosen as the reference Codec implementation because the format is
  * fully decodable in pure JVM — the seam is proven with real pixel data,
  * not a mock. */
object PpmCodec extends Codec {

  override val formats: Set[String] = Set("ppm", "pgm")

  override def decode(payload: Array[Byte]): Codec.Image = {
    var pos = 0
    def skipWs(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        val c = payload(pos).toChar
        if (c == '#') { // comment: to end of line
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else go = false
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < payload.length &&
        !Character.isWhitespace(payload(pos).toChar)) pos += 1
      require(pos > start, "unexpected end of PPM header")
      new String(payload, start, pos - start, "US-ASCII")
    }
    val magic = token()
    val channels = magic match {
      case "P6" => 3
      case "P5" => 1
      case m => throw new IllegalArgumentException(
        s"not a binary netpbm payload (magic '$m', want P5/P6)")
    }
    val w = token().toInt
    val h = token().toInt
    val maxVal = token().toInt
    require(w > 0 && h > 0, s"bad raster dims ${w}x$h")
    require(maxVal > 0 && maxVal < 256,
      s"maxval $maxVal unsupported (8-bit samples only)")
    pos += 1 // the single whitespace byte terminating the header
    val n = w * h * channels
    require(payload.length - pos >= n,
      s"truncated raster: need $n bytes, have ${payload.length - pos}")
    Codec.Image(w, h, channels, java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }
}

/** AVI (RIFF) container walk — the VIDEO container the round-8 verdict
  * left as the standing out-of-scope adjudication, now closed for the
  * lossless case: a pure-JVM RIFF parser (same chunk grammar as the WAV
  * parse: fourcc + u32le size + payload, word-aligned) walks
  * RIFF('AVI ') → LIST('hdrl') → LIST('strl') → 'strf' for the
  * BITMAPINFOHEADER geometry, then LIST('movi') for the frame chunks:
  *
  *  - '..db' chunks are UNCOMPRESSED DIB rasters (BI_RGB): bottom-up
  *    rows, BGR byte order, rows padded to 4-byte boundaries — decoded
  *    here in pure JVM, byte-exact (the hash-gated path);
  *  - '..dc' chunks are compressed frames (MJPEG et al.) and are handed
  *    to `javax.imageio` — real decode, but JPEG is lossy so such assets
  *    are spec-gated, not oracle-gated.
  *
  * MP4/H.264 remain out of scope (no demuxer in the JDK); AVI+DIB gives
  * the container-walk + frame-fan-out proof with bit-exact pixel data.
  */
object AviCodec extends FrameCodec {

  override val formats: Set[String] = Set("avi")

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  override def decodeFrames(payload: Array[Byte]): IndexedSeq[Codec.Image] = {
    require(payload.length >= 12 && fcc(payload, 0) == "RIFF" &&
      fcc(payload, 8) == "AVI ", "not a RIFF/AVI payload")
    var width = 0; var height = 0; var bitCount = 0; var compression = 0L
    val frames = IndexedSeq.newBuilder[Codec.Image]

    // walk a chunk range [p, end); LISTs recurse (their payload starts
    // with the list type fourcc, then sub-chunks)
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fcc(payload, p)
        val size = u32(payload, p + 4).toInt
        val body = p + 8
        if (id == "RIFF" || id == "LIST") {
          walk(body + 4, body + size) // skip the list-type fourcc
        } else if (id == "strf" && width == 0) {
          // BITMAPINFOHEADER: biWidth @+4, biHeight @+8, biBitCount @+14,
          // biCompression @+16 (0 = BI_RGB)
          width = u32(payload, body + 4).toInt
          height = u32(payload, body + 8).toInt
          bitCount = u16(payload, body + 14)
          compression = u32(payload, body + 16)
        } else if (id.length == 4 && id.endsWith("db")) {
          require(width > 0 && height > 0,
            "AVI: DIB frame chunk before the strf geometry header")
          require(compression == 0L && bitCount == 24,
            s"AVI: only BI_RGB 24-bit DIB frames decode losslessly, " +
              s"got compression=$compression bitCount=$bitCount")
          frames += dibToImage(payload, body, size, width, height)
        } else if (id.length == 4 && id.endsWith("dc")) {
          // compressed frame (e.g. MJPEG) → real imageio decode
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            payload, body, size))
          require(img != null, s"AVI: no imageio reader for '$id' frame")
          frames += ImageIoSupport.toRgbBytes(img)
        }
        p = body + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, payload.length)
    val out = frames.result()
    require(out.nonEmpty, "no frame chunks in AVI payload")
    out
  }

  /** Bottom-up BGR DIB raster (rows padded to 4 bytes) → top-down RGB. */
  private def dibToImage(b: Array[Byte], off: Int, size: Int,
                         w: Int, h: Int): Codec.Image = {
    val stride = (w * 3 + 3) & ~3
    require(size >= stride * h,
      s"truncated DIB frame: need ${stride * h} bytes, have $size")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = b(s + 2)     // R (DIB stores BGR)
        rgb(d + 1) = b(s + 1) // G
        rgb(d + 2) = b(s)     // B
        x += 1
      }
      y += 1
    }
    Codec.Image(w, h, 3, rgb)
  }
}
