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

/** RIFF/WAVE PCM decode via `javax.sound.sampled` — the one mainstream
  * media codec that is pure-JVM (the JDK ships a WaveFileReader service
  * provider; no native libs, headless-safe), which makes WAV the first
  * REAL audio modality in the pipeline rather than a stubbed seam. The
  * header parse (RIFF chunk walk, fmt validation) is the JDK's, not a
  * hand-rolled byte scan — exactly what plugging a real library into the
  * seam is supposed to look like. 16-bit signed PCM only (the format the
  * asset builder emits; JPEG/MP4 remain out of scope — no native codecs
  * in this sandbox). */
object WavCodec extends AudioCodec {

  override val formats: Set[String] = Set("wav")

  override def decode(payload: Array[Byte]): Codec.Audio = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"unsupported encoding ${fmt.getEncoding} (want 16-bit signed PCM)")
      require(fmt.getSampleSizeInBits == 16,
        s"unsupported sample size ${fmt.getSampleSizeInBits} (want 16)")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val samples = new Array[Int](n)
      val be = fmt.isBigEndian
      var i = 0
      while (i < n) {
        val b0 = bytes(2 * i) & 0xff
        val b1 = bytes(2 * i + 1) & 0xff
        samples(i) = (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
        i += 1
      }
      Codec.Audio(fmt.getSampleRate.toInt, fmt.getChannels, samples)
    } finally in.close()
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
