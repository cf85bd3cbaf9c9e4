package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns plus typed metadata, exactly like a production
  * training-data pipeline (schema, partitioning, and batch shape are real;
  * only the codec call is stubbed, because no media libraries exist in this
  * environment).
  *
  * Layout contract: (asset_id long, modality string, payload binary,
  * byte_len int, format string). Decoders run per-partition over batches —
  * the same shape a Pandas-UDF / mapInPandas implementation has — so
  * swapping the stub for a real JNI/FFI codec changes one function.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Deterministic fake "media" assets derived from the documents table:
    * payload = utf-8 bytes of the text, modality/format from the doc id.
    * Stands in for `spark.read.format("binaryFile")` over a media lake. */
  def assetsFromDocuments(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("modality"),
      col(textCol).cast(BinaryType).as("payload"),
      length(col(textCol).cast(BinaryType)).as("byte_len"),
      element_at(lit(Array("jpeg", "wav", "mp4")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("format"))

  /** Deterministic P6 PPM asset per document — REAL image payloads for the
    * pluggable-[[Codec]] path: width = 1 + len%16, height = 1 + (len/16)%16,
    * pixel bytes cycled from the text's ASCII codes (empty docs → 1×1
    * black). Every byte is arithmetic on (doc_id, length, text), so the
    * DuckDB oracle replays the decoded output without parsing PPM. */
  def ppmAssetsFromDocuments(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val len = text.length
          val w = 1 + len % 16
          val h = 1 + (len / 16) % 16
          val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
          val pixels = Array.tabulate(w * h * 3)(i =>
            if (len == 0) 0.toByte else text.charAt(i % len).toByte)
          val payload = header ++ pixels
          Row(id, "image", payload, payload.length, "ppm")
        }
      }(enc)
  }

  /** The deterministic raster every image-format builder shares: width =
    * 1 + len%16, height = 1 + (len/16)%16, RGB bytes cycled from the
    * text's code points (empty docs → 1×1 black) — the same arithmetic as
    * [[ppmAssetsFromDocuments]], so every lossless format's decoded
    * output oracles with the same replay SQL. */
  private def rgbRaster(text: String): (Int, Int, Array[Byte]) = {
    val len = text.length
    val w = 1 + len % 16
    val h = 1 + (len / 16) % 16
    val px = Array.tabulate(w * h * 3)(i =>
      if (len == 0) 0.toByte else text.charAt(i % len).toByte)
    (w, h, px)
  }

  /** Packed-RGB raster → BufferedImage for the `javax.imageio` encoders. */
  private def toBufferedRgb(w: Int, h: Int,
                            px: Array[Byte]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        img.setRGB(x, y, ((px(i) & 0xff) << 16) |
          ((px(i + 1) & 0xff) << 8) | (px(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Deterministic PNG asset per document — the [[rgbRaster]] pixels run
    * through the JDK's REAL PNG encoder (DEFLATE + filtering) on the
    * executors; [[ImageIoCodec]] then runs the real inflater on the way
    * back. PNG is lossless, so the decoded raster equals the constructed
    * one byte-for-byte and the m_codec oracle arithmetic applies
    * unchanged — the hash gate spans a genuine compressed-format round
    * trip, not a header parse. */
  def pngAssetsFromDocuments(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    imageioAssets(docs, idCol, textCol, "png")

  /** Deterministic JPEG asset per document — the same raster through the
    * JDK's REAL baseline-DCT JPEG encoder (default quality). Lossy: only
    * the lossless invariants (dims, channels) are oracle-gated
    * (`m_jpeg_meta`); CodecSpec holds the pixel-fidelity bound. */
  def jpegAssetsFromDocuments(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    imageioAssets(docs, idCol, textCol, "jpeg")

  private def imageioAssets(docs: DataFrame, idCol: String, textCol: String,
                            format: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = rgbRaster(r.getString(1))
          val bo = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(toBufferedRgb(w, h, px), format, bo)
          val payload = bo.toByteArray
          Row(id, "image", payload, payload.length, format)
        }
      }(enc)
  }

  /** PNG asset per document with 1 + len%3 injected tEXt metadata chunks
    * ("Author" → "user-<id>-<j>" — the privacy-sensitive records web-crawled
    * images actually carry) spliced after IHDR with correct CRCs
    * ([[PngChunks.injectText]]): the fixture for [[stripMetaStats]]. The
    * injection count is pure construction arithmetic, so the oracle
    * predicts it without parsing anything. */
  def pngAssetsWithText(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val (w, h, px) = rgbRaster(text)
          val bo = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(toBufferedRgb(w, h, px), "png", bo)
          val k = 1 + text.length % 3
          val payload = PngChunks.injectText(bo.toByteArray,
            (0 until k).map(j => ("Author", s"user-$id-$j")))
          Row(id, "image", payload, payload.length, "png")
        }
      }(enc)
  }

  /** Schema of [[stripMetaStats]]. */
  val stripSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_text_dropped", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  /** The privacy-scrub operator: per asset walk the real PNG chunk
    * grammar, drop every ancillary chunk ([[PngChunks.stripAncillary]] —
    * tEXt/zTXt/iTXt/eXIf/tIME/…), reassemble, then DECODE the scrubbed
    * payload with the real codec. Because PNG is lossless and the strip
    * must not touch the image stream, the decoded dims + pixel checksum
    * equal the construction arithmetic — the hash gate proves the
    * metadata is gone AND the pixels survived, in one pass. Per-partition
    * map, no shuffle; at 100 TB this is the same scan-shaped pass as
    * every other m_* decode. */
  def stripMetaStats(assets: DataFrame, codec: Codec): DataFrame = {
    val enc = ExpressionEncoder(stripSchema)
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val (clean, nText) = PngChunks.stripAncillary(r.getAs[Array[Byte]](1))
          val img = codec.decode(clean)
          var sum = 0L
          img.pixels.foreach(b => sum += (b & 0xff))
          Row(r.getLong(0), img.width, img.height, nText, sum)
        }
      }(enc)
  }

  /** JPEG asset per document with 1 + len%3 injected EXIF-shaped APP1
    * segments ("Exif\0\0user-<id>-<j>" — where camera GPS/author/time
    * records actually live) and len%2 COM segments spliced after SOI
    * ([[JpegSegments.injectMeta]]): the fixture for [[jpegStripStats]].
    * Both injection counts are pure construction arithmetic, so the
    * oracle predicts them without parsing anything. */
  def jpegAssetsWithMeta(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val (w, h, px) = rgbRaster(text)
          val bo = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(toBufferedRgb(w, h, px), "jpeg", bo)
          val k = 1 + text.length % 3
          val c = text.length % 2
          val payload = JpegSegments.injectMeta(bo.toByteArray,
            (0 until k).map(j => s"user-$id-$j"),
            (0 until c).map(j => s"comment-$id-$j"))
          Row(id, "image", payload, payload.length, "jpeg")
        }
      }(enc)
  }

  /** Schema of [[jpegStripStats]]. */
  val jpegStripSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_app1", IntegerType, nullable = false),
    StructField("n_com", IntegerType, nullable = false),
    StructField("px_equal", BooleanType, nullable = false)))

  /** The privacy scrub for the LOSSY image format: walk the real JPEG
    * marker-segment grammar, drop every APP1..APP15 and COM segment
    * ([[JpegSegments.stripMeta]]), reassemble, and decode BOTH payloads
    * with the real codec. JPEG is lossy but stripping is not — the
    * entropy-coded stream passes through byte-identical — so the decoded
    * rasters must match bit-for-bit (px_equal), while dims and the
    * dropped-segment counts replay from construction arithmetic. The
    * same scan-shaped per-partition pass as [[stripMetaStats]]. */
  def jpegStripStats(assets: DataFrame, codec: Codec): DataFrame = {
    val enc = ExpressionEncoder(jpegStripSchema)
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val (clean, nApp1, nCom) = JpegSegments.stripMeta(payload)
          val img = codec.decode(clean)
          val orig = codec.decode(payload)
          val eq = img.width == orig.width && img.height == orig.height &&
            java.util.Arrays.equals(img.pixels, orig.pixels)
          Row(r.getLong(0), img.width, img.height, nApp1, nCom, eq)
        }
      }(enc)
  }

  /** Deterministic multi-frame animated-GIF asset per document: 1 +
    * len%6 frames of the document's raster dims, frame f's gray sample at
    * flat index i = code(text[(i + 7f) mod len]) — each frame is the text
    * cycled at a different phase, so consecutive frames genuinely differ
    * (a static animation would make frame indexing untestable). Frames
    * are indexed 256-level gray (GIF's palette model, exact) and written
    * NON-interlaced — the JDK reader drops rows of interlaced frames with
    * height 2..4, see [[GifCodec]]'s caveat — via one writer per
    * partition ([[GifCodec]] then walks the real GIF89a block structure
    * on the way back). */
  def gifAssetsFromDocuments(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val len = text.length
          val payload = buildGrayGif(1 + len % 16, 1 + (len / 16) % 16,
            1 + len % 6, (x, y, w, f) =>
              if (len == 0) 0 else text.charAt((y * w + x + f * 7) % len).toInt)
          Row(id, "video", payload, payload.length, "gif")
        }
      }(enc)
  }

  /** [[gifAssetsFromDocuments]] plus a RE-ENCODED variant for every 4th
    * doc — the near-dup video fixture (the m_strip_meta injected-chunk
    * idiom applied to the video modality): asset 2·doc_id is the original,
    * asset 2·doc_id+1 (doc_id ≡ 0 mod 4 only) re-renders the identical
    * content with pixel 0 of every frame brightened one gray level — the
    * kind of sub-perceptual drift a real re-encode introduces, small
    * enough that frame fingerprints stay within the banded Hamming
    * radius, large enough that the payload is byte-distinct. */
  def gifAssetsWithReencodes(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val len = text.length
          val (w, h, nf) = (1 + len % 16, 1 + (len / 16) % 16, 1 + len % 6)
          def gray(x: Int, y: Int, wd: Int, f: Int): Int =
            if (len == 0) 0 else text.charAt((y * wd + x + f * 7) % len).toInt
          val orig = buildGrayGif(w, h, nf, gray)
          val base = Row(id * 2, "video", orig, orig.length, "gif")
          if (id % 4 != 0) Iterator(base)
          else {
            val re = buildGrayGif(w, h, nf, (x, y, wd, f) =>
              gray(x, y, wd, f) + (if (y * wd + x == 0) 1 else 0))
            Iterator(base, Row(id * 2 + 1, "video", re, re.length, "gif"))
          }
        }
      }(enc)
  }

  /** Shared indexed-gray animated-GIF writer: frame f's pixel (x, y) =
    * px(x, y, w, f), palette entry i = rgb(i,i,i). */
  private def buildGrayGif(w: Int, h: Int, nFrames: Int,
                           px: (Int, Int, Int, Int) => Int): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bo = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bo)
    val param = wr.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    try {
      wr.setOutput(ios)
      wr.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, px(x, y, w, f))
            x += 1
          }
          y += 1
        }
        wr.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      wr.endWriteSequence()
    } finally {
      wr.dispose()
      ios.close()
    }
    bo.toByteArray
  }

  /** Deterministic RIFF/AVI asset per document — a REAL video CONTAINER
    * (the RIFF chunk grammar of the WAV assets, carrying video): full
    * hdrl (avih + strl/strh/strf BITMAPINFOHEADER) and a movi LIST of
    * UNCOMPRESSED 24-bit BI_RGB '00db' DIB frames (bottom-up BGR rows
    * padded to 4 bytes). Geometry and pixels follow the GIF recipe —
    * w = 1+len%16, h = 1+(len/16)%16, nFrames = 1+len%6, display-row
    * pixel (x,y) of frame f = gray code(text[(y·w+x+7f) mod len]) stored
    * as (B,G,R)=(v,v,v) — so the decoded per-frame stats are IDENTICAL to
    * the GIF path's and the m_gif_frames construction-replay oracle gates
    * this container byte-for-byte (DIB is lossless; MJPEG '00dc' frames
    * would decode too but lossily, hence spec-only). */
  def aviAssetsFromDocuments(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val len = text.length
          val w = 1 + len % 16
          val h = 1 + (len / 16) % 16
          val nFrames = 1 + len % 6
          val payload = buildDibAvi(w, h, nFrames, (x, y, f) =>
            if (len == 0) 0 else text.charAt((y * w + x + f * 7) % len).toInt & 0xff)
          Row(id, "video", payload, payload.length, "avi")
        }
      }(enc)
  }

  /** Minimal conformant RIFF-AVI writer: RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' '00db'×n)). Little-endian
    * throughout; chunks word-aligned (DIB strides already are). */
  private def buildDibAvi(w: Int, h: Int, nFrames: Int,
                          gray: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val frameBytes = stride * h
    val bo = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      bo.write((v & 0xff).toInt); bo.write(((v >> 8) & 0xff).toInt)
      bo.write(((v >> 16) & 0xff).toInt); bo.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { bo.write(v & 0xff); bo.write((v >> 8) & 0xff) }
    def fcc(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    fcc("RIFF"); u32(riffSize); fcc("AVI ")
    fcc("LIST"); u32(hdrlSize); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(100000L); u32(frameBytes * 10L); u32(0); u32(0) // µs/frame, bps, pad, flags
    u32(nFrames); u32(0); u32(1); u32(frameBytes)       // frames, initial, streams, bufsize
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)      // dims + reserved[4]
    fcc("LIST"); u32(strlSize); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); fcc("DIB "); u32(0); u16(0); u16(0)    // type, handler, flags, prio, lang
    u32(0); u32(1); u32(10); u32(0); u32(nFrames)       // initial, scale, rate, start, length
    u32(frameBytes); u32(0); u32(0)                     // bufsize, quality, samplesize
    u16(0); u16(0); u16(w); u16(h)                      // rcFrame
    fcc("strf"); u32(40)
    u32(40); u32(w); u32(h); u16(1); u16(24)            // biSize, w, h, planes, bitcount
    u32(0); u32(frameBytes); u32(0); u32(0); u32(0); u32(0) // BI_RGB, sizeImage, rest
    fcc("LIST"); u32(moviSize); fcc("movi")
    var f = 0
    while (f < nFrames) {
      fcc("00db"); u32(frameBytes)
      var row = h - 1 // bottom-up: file row 0 is display row h-1
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = gray(x, row, f)
          bo.write(v); bo.write(v); bo.write(v) // B, G, R all = gray
          x += 1
        }
        var pad = stride - w * 3
        while (pad > 0) { bo.write(0); pad -= 1 }
        row -= 1
      }
      f += 1
    }
    bo.toByteArray
  }

  /** Per-frame stats schema for the [[FrameCodec]] decode pass. */
  val frameStatsSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  /** The multi-frame decode pass: one output row per DECODED frame —
    * real frame fan-out (row multiplication driven by the container's
    * actual frame count, not metadata arithmetic). Same discipline as the
    * other decode passes: rasters die in the scan stage, only the
    * fixed-width stats rows flow on. */
  def decodeFrameStats(assets: DataFrame, codec: FrameCodec): DataFrame = {
    val enc = ExpressionEncoder(frameStatsSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.decodeFrames(r.getAs[Array[Byte]](1)).zipWithIndex.map {
            case (img, f) =>
              var sum = 0L
              img.pixels.foreach(b => sum += (b & 0xff))
              Row(id, f, img.width, img.height, sum)
          }
        }
      }(enc)
  }

  /** Per-frame signature schema for [[frameHashes]]. */
  val frameHashSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  /** Per-frame perceptual signatures from a multi-frame container decode —
    * [[decodeFrameStats]]'s pass shape emitting the [[aHash]] instead of
    * raw stats. Frames with fewer pixels than the 64-position sampling
    * grid are excluded: below that every sample re-reads the same few
    * bytes, all such frames collapse onto one degenerate signature, and at
    * corpus scale that one hot key would weld unrelated videos into a
    * single clique (the same reason MinHash pipelines drop ultra-short
    * documents). Rasters die in the scan stage; 20 bytes/frame flow on. */
  def frameHashes(assets: DataFrame, codec: FrameCodec): DataFrame = {
    val enc = ExpressionEncoder(frameHashSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          codec.decodeFrames(r.getAs[Array[Byte]](1)).zipWithIndex
            .filter { case (img, _) => img.width * img.height >= 64 }
            .map { case (img, f) =>
              val (hi, lo) = aHash(img.pixels)
              Row(id, f, hi, lo)
            }
        }
      }(enc)
  }

  /** Video near-duplicate pairs — the content-ID shape: per-frame
    * signature → the pigeonhole-complete banded Hamming join
    * ([[phashPairs]], keyed by the composite frame id asset·8+frame —
    * containers cap at 6 frames, so the key is bijective) → per-video-pair
    * matched-frame count. A pair qualifies when matched frame pairs cover
    * at least half the smaller video (2·matched ≥ min(nf_a, nf_b)). At
    * 100 TB the candidate volume is 4 band-key equality shuffles over
    * 16-byte signatures — Σ (frames per band-key)², bounded by real
    * visual duplication, never frames². */
  def videoNeardupPairs(frames: DataFrame, maxDist: Int): DataFrame = {
    val keyed = frames.select(
      (col("asset_id") * 8 + col("frame_idx")).as("asset_id"),
      col("hi"), col("lo")).localCheckpoint(true)
    val fpairs = phashPairs(keyed, maxDist)
    val nf = frames.groupBy("asset_id").agg(count(lit(1)).as("nf"))
    fpairs
      .select(expr("id_a div 8").as("va"), expr("id_b div 8").as("vb"))
      .filter(col("va") =!= col("vb"))
      .groupBy("va", "vb").agg(count(lit(1)).as("matched_frames"))
      .join(nf.select(col("asset_id").as("va"), col("nf").as("nf_a")), "va")
      .join(nf.select(col("asset_id").as("vb"), col("nf").as("nf_b")), "vb")
      .filter(col("matched_frames") * 2 >= least(col("nf_a"), col("nf_b")))
      .select(col("va").as("id_a"), col("vb").as("id_b"),
        col("matched_frames"), col("nf_a"), col("nf_b"))
  }

  /** Deterministic RIFF/WAVE PCM asset per document — REAL audio payloads
    * for the [[AudioCodec]] path: mono 16-bit signed little-endian PCM at
    * 8 kHz, n = 1 + len%64 samples, sample i = (code(text[i % len]) % 64
    * - 32) · 512 (0 for empty docs). ASCII space maps to amplitude 0, so
    * real text yields genuine silence gaps between words — which is what
    * makes the silence-span statistic downstream non-trivial. The header
    * is a full RIFF chunk structure [[WavCodec]]'s chunk walk parses; every
    * sample is arithmetic on (length, text), so the DuckDB oracle replays
    * the decoded output without parsing WAV. */
  def wavAssetsFromDocuments(docs: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val enc = ExpressionEncoder(assetSchema)
    docs.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val len = text.length
          val n = 1 + len % 64
          val dataSize = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1)          // PCM
            .putShort(1)          // mono
            .putInt(8000)         // sample rate
            .putInt(16000)        // byte rate
            .putShort(2)          // block align
            .putShort(16)         // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(dataSize)
          (0 until n).foreach { i =>
            val amp = if (len == 0) 0
              else (text.charAt(i % len).toInt % 64 - 32) * 512
            bb.putShort(amp.toShort)
          }
          val payload = bb.array()
          Row(id, "audio", payload, payload.length, "wav")
        }
      }(enc)
  }

  /** Schema of [[resampleAudioStats]]. */
  val resampleSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_out", IntegerType, nullable = false),
    StructField("amp_sum", LongType, nullable = false),
    StructField("amp_max", IntegerType, nullable = false)))

  /** 2× audio downsampling in the decode pass — the m_resize idea on the
    * audio axis, but with REAL decoded PCM (a speech pipeline resamples
    * everything to its model rate before windowing): consecutive sample
    * pairs average with FLOOR division (Math.floorDiv here, `//` in the
    * oracle — identical on negatives, unlike truncation), a trailing odd
    * sample is dropped, and the output clip's amplitude stats ship. Per
    * partition, no shuffle; only fixed-width stats leave the scan. */
  def resampleAudioStats(assets: DataFrame, codec: AudioCodec): DataFrame = {
    val enc = ExpressionEncoder(resampleSchema)
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val a = codec.decode(r.getAs[Array[Byte]](1))
          val n = a.samples.length / 2
          var sum = 0L
          var mx = 0
          var k = 0
          while (k < n) {
            val v = Math.floorDiv(a.samples(2 * k) + a.samples(2 * k + 1), 2)
            val av = math.abs(v)
            sum += av
            if (av > mx) mx = av
            k += 1
          }
          Row(r.getLong(0), a.sampleRate / 2, n, sum, mx)
        }
      }(enc)
  }

  /** Decoded-audio statistics schema: per-clip amplitude stats plus the
    * longest run of zero samples (the silence-span primitive of
    * voice-activity trimming). */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("amp_sum", LongType, nullable = false),
    StructField("amp_max", IntegerType, nullable = false),
    StructField("max_silence_run", IntegerType, nullable = false)))

  /** The audio-codec decode pass: per-partition REAL decode (header parse
    * + PCM extraction by the codec), then per-clip amplitude stats and the
    * longest zero-sample run, all exact integer arithmetic so the result
    * hash-gates. The raw samples never shuffle — only the fixed-width
    * stats row leaves the scan stage, the same only-metadata-moves
    * discipline as the image pipeline. */
  def decodeAudioStats(assets: DataFrame, codec: AudioCodec): DataFrame = {
    val enc = ExpressionEncoder(audioStatsSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val a = codec.decode(r.getAs[Array[Byte]](1))
          var sum = 0L
          var mx = 0
          var run = 0
          var best = 0
          a.samples.foreach { s =>
            val abs = math.abs(s)
            sum += abs
            if (abs > mx) mx = abs
            if (s == 0) { run += 1; if (run > best) best = run }
            else run = 0
          }
          Row(r.getLong(0), a.sampleRate, a.channels, a.samples.length,
            sum, mx, best)
        }
      }(enc)
  }

  val audioSegSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("n_segments", IntegerType, nullable = false),
    StructField("longest_segment", IntegerType, nullable = false),
    StructField("voiced_samples", IntegerType, nullable = false),
    StructField("loudest_energy", LongType, nullable = false)))

  /** Voice-activity-style segmentation over DECODED PCM: maximal runs of
    * non-zero samples are segments; per clip emit segment count, longest
    * segment, voiced-sample total, and the loudest segment's |amp| energy
    * — all exact integers, computed in the same single decode pass as
    * [[decodeAudioStats]] so only the fixed-width row leaves the scan. */
  def decodeAudioSegments(assets: DataFrame, codec: AudioCodec): DataFrame = {
    val enc = ExpressionEncoder(audioSegSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val a = codec.decode(r.getAs[Array[Byte]](1))
          var nSeg = 0; var longest = 0; var voiced = 0
          var curLen = 0; var curE = 0L; var bestE = 0L
          a.samples.foreach { s =>
            if (s != 0) {
              if (curLen == 0) nSeg += 1
              curLen += 1; voiced += 1; curE += math.abs(s)
              if (curLen > longest) longest = curLen
              if (curE > bestE) bestE = curE
            } else { curLen = 0; curE = 0L }
          }
          Row(r.getLong(0), nSeg, longest, voiced, bestE)
        }
      }(enc)
  }

  /** Per-clip waveform polarity fingerprint from DECODED PCM — the audio
    * analogue of [[imageHashes]]: bit i (i in 0..61) is set iff sample
    * (i mod n_samples) > 0, i.e. the polarity sequence CYCLED across all
    * 62 bits. Cycling (rather than zero-padding short clips) is a scale
    * requirement, not cosmetics: with padding, every clip shorter than 48
    * samples shares an all-zero top band, and that one hot band key makes
    * the banded candidate join quadratic in the short-clip population
    * (measured: ~half the corpus in one bucket at sf0.1; cycled, the
    * hottest of the 4×16-bit band buckets holds <7% of clips). 62 bits,
    * not 64, because the DuckDB oracle's signed `1::BIGINT << i`
    * overflows at 63 — the cap is part of the cross-engine contract.
    * Clips shorter than `minSamples` are dropped (too little waveform to
    * be distinctive even cycled). Emitted as (asset_id, hi, lo) 32-bit
    * halves so the banded [[phashPairs]] candidate join applies unchanged
    * — 16 fingerprint bytes per clip; raw samples never leave the decode
    * stage. */
  def audioFingerprints(assets: DataFrame, codec: AudioCodec,
                        minSamples: Int): DataFrame = {
    val enc = ExpressionEncoder(hashSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val a = codec.decode(r.getAs[Array[Byte]](1))
          if (a.samples.length < minSamples) None
          else {
            var fp = 0L
            var i = 0
            while (i < 62) {
              if (a.samples(i % a.samples.length) > 0) fp |= 1L << i
              i += 1
            }
            Some(Row(r.getLong(0), fp >>> 32, fp & 0xFFFFFFFFL))
          }
        }
      }(enc)
  }

  /** Decoded-image schema produced by a real [[Codec]]: raster dims plus
    * `px_sum` (the decoder's sample checksum — exact integer arithmetic,
    * so it oracle-checks) and the raster itself for downstream stages. */
  val imageSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  /** The pluggable-codec decode pass: assets whose `format` the codec
    * claims are decoded per partition; other formats are excluded by the
    * upfront filter (route them to another codec's pass — at scale each
    * pass's filter prunes on the partition/bucketing column `format`). */
  def decodeImages(assets: DataFrame, codec: Codec): DataFrame = {
    val enc = ExpressionEncoder(imageSchema)
    assets
      .filter(lower(col("format")).isin(codec.formats.toSeq: _*))
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val img = codec.decode(r.getAs[Array[Byte]](1))
          var sum = 0L
          img.pixels.foreach(b => sum += (b & 0xff))
          Row(r.getLong(0), img.width, img.height, img.channels, sum, img.pixels)
        }
      }(enc)
  }

  /** Decoded-feature schema produced by the (stubbed) codec. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature_norm", DoubleType, nullable = false)))

  /** STUB codec: a real implementation would hand `payload` to an image/audio
    * decoder (the Spark-side plumbing — per-partition batching, typed output
    * schema — is what this exercises). The fake is deterministic: n_frames
    * from payload length, feature_norm from a byte checksum. */
  private def decodeStub(assetId: Long, modality: String, payload: Array[Byte]): Row = {
    val frames = 1 + payload.length / 1024
    val checksum = payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000003L)
    Row(assetId, modality, frames, checksum.toDouble / 1000003.0)
  }

  /** Per-partition decode — the mapInPandas-shaped entry point. Partition by
    * asset_id first at scale so codec work balances across executors. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    assets.select("asset_id", "modality", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          decodeStub(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }(enc)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("orig_len", IntegerType, nullable = false),
    StructField("new_len", IntegerType, nullable = false),
    StructField("resized", BinaryType, nullable = false)))

  /** STUB resize/transcode: keep every `factor`-th payload byte — the
    * deterministic stand-in for an image resize / audio downsample. What
    * this exercises is the Spark-side shape of a transcode pass: binary in,
    * smaller binary out, per-partition codec work, new size metadata riding
    * along for downstream pruning. */
  def resizeAssets(assets: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "resize factor must be >= 1")
    val enc = ExpressionEncoder(resizeSchema)
    assets.select("asset_id", "modality", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val out = Array.ofDim[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          Row(r.getLong(0), r.getString(1), payload.length, out.length, out)
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", BinaryType, nullable = false)))

  /** Frame sampling: 1 row per `strideBytes` chunk of the payload — the
    * batch shape of video frame extraction (a real codec would seek
    * keyframes; the chunking, fan-out row multiplication, and binary
    * sub-slicing are the Spark-side work being exercised). */
  def sampleFrames(assets: DataFrame, strideBytes: Int): DataFrame = {
    val enc = ExpressionEncoder(frameSchema)
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val n = math.max(1, (payload.length + strideBytes - 1) / strideBytes)
          (0 until n).iterator.map { i =>
            val from = i * strideBytes
            val to = math.min(payload.length, from + strideBytes)
            Row(id, i, java.util.Arrays.copyOfRange(payload, from, to))
          }
        }
      }(enc)
  }

  /** STUB feature extractor: a deterministic `dim`-float embedding from the
    * payload bytes (byte histogram folded into dim buckets, L2-normalized) —
    * stands in for an image/audio encoder model. Output plugs directly into
    * operators.Similarity / IvfIndex, completing the media → embedding →
    * ANN pipeline shape. */
  def embedStub(assets: DataFrame, dim: Int): DataFrame = {
    val enc = ExpressionEncoder(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false))))
    assets.select("asset_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val buckets = new Array[Double](dim)
          payload.foreach(b => buckets((b & 0xff) % dim) += 1.0)
          val norm = math.sqrt(buckets.map(x => x * x).sum).max(1e-12)
          Row(id, buckets.map(x => (x / norm).toFloat).toSeq)
        }
      }(enc)
  }

  /** 64-bit average-hash (aHash) of a raster, split into two unsigned
    * 32-bit halves (signed-bigint bit-63 headaches never arise): 64
    * evenly-spaced byte samples compared against the EXACT byte mean via
    * the rational form sample·n ≥ Σbytes — no division, pure integer
    * arithmetic, so the oracle replays it bit-for-bit from the asset
    * construction. Bit j of the signature is set when sample j clears
    * the mean; j<32 land in `lo`, j≥32 in `hi`. */
  def aHash(pixels: Array[Byte]): (Long, Long) = {
    val n = pixels.length
    var s = 0L
    var i = 0
    while (i < n) { s += pixels(i) & 0xff; i += 1 }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 64) {
      val p = (j.toLong * n / 64).toInt
      if ((pixels(p) & 0xff).toLong * n >= s) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Hash schema for [[imageHashes]]. */
  val hashSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  /** Per-image perceptual signatures from DECODED rasters ([[decodeImages]]
    * output) — the hash runs on real codec pixels, per partition, and only
    * 17 bytes per asset flow onward (never the raster). */
  def imageHashes(decoded: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(hashSchema)
    decoded.select("asset_id", "pixels")
      .mapPartitions { rows =>
        rows.map { r =>
          val (hi, lo) = aHash(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), hi, lo)
        }
      }(enc)
  }

  /** Perceptual near-dup pairs at Hamming distance ≤ `maxDist` (≤ 3 keeps
    * the 4×16-bit band blocking COMPLETE by pigeonhole: ≤3 differing bits
    * cannot touch all four bands, so some band matches exactly and the
    * banded join provably finds every qualifying pair — the oracle checks
    * the claim by computing all-pairs distance with no blocking at all).
    * Candidate generation is 4 band-key equi-joins (the MinHash-LSH shape:
    * key-equality shuffles, never all-pairs at scale); the distance check
    * is codegen'd xor + bit_count per candidate. */
  def phashPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "banded blocking is only complete for maxDist <= 3")
    val withBands = hashes.select(col("asset_id"), col("hi"), col("lo"),
      col("lo").bitwiseAND(lit(65535L)).as("b0"),
      shiftright(col("lo"), 16).bitwiseAND(lit(65535L)).as("b1"),
      col("hi").bitwiseAND(lit(65535L)).as("b2"),
      shiftright(col("hi"), 16).bitwiseAND(lit(65535L)).as("b3"))
    val bands = (0 to 3).map { k =>
      withBands.select(col("asset_id"), col("hi"), col("lo"),
        col(s"b$k").as("bk"), lit(k).as("band"))
    }.reduce(_ unionByName _)
    bands.alias("x")
      .join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bk") === col("y.bk") &&
          col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("id_a"), col("y.asset_id").as("id_b"),
        col("x.hi").as("ha"), col("x.lo").as("la"),
        col("y.hi").as("hb"), col("y.lo").as("lb"))
      .distinct()
      .withColumn("dist",
        expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").cast("int"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
