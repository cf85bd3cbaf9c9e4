package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Frame-fingerprint video near-dup: properties the oracle hash can't
  * express — the small-frame exclusion rule, re-encode pairing under the
  * banded Hamming join, and non-pairing of distinct content. */
class VideoNeardupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // text length drives geometry: w = 1+len%16, h = 1+(len/16)%16,
  // nFrames = 1+len%6. len = 127 → 16×8 (wh = 128 ≥ 64), 2 frames.
  private val bigText = ("the quick brown fox jumps over the lazy dog " * 3)
    .substring(0, 127)
  // len = 5 → 6×1 (wh = 6 < 64): every frame below the sampling grid
  private val tinyText = "small"

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def hashes(rows: (Long, String)*) =
    Multimodal.frameHashes(
      Multimodal.gifAssetsWithReencodes(docsDf(rows: _*), "doc_id", "text"),
      GifCodec)

  test("frames below the 64-pixel sampling grid are excluded") {
    // doc 1: no variant (1 % 4 != 0) → asset 2 only; doc 2 → asset 4 only
    val h = hashes(1L -> bigText, 2L -> tinyText).collect()
    assert(h.nonEmpty && h.forall(_.getLong(0) == 2L),
      "tiny-frame video must contribute no signatures")
    assert(h.map(_.getInt(1)).toSet == Set(0, 1)) // 1+127%6 = 2 frames
  }

  test("re-encoded variant pairs with its original; distinct content does not pair") {
    // doc 0 gets a variant (asset 1); docs 0 and 3 have unrelated pixels
    val pairs = Multimodal.videoNeardupPairs(
      hashes(0L -> bigText, 3L -> bigText.reverse), maxDist = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    val p = pairs.head
    assert(p.getLong(2) >= 1L && p.getLong(3) == 2L && p.getLong(4) == 2L)
  }

  test("signature replay: engine hash matches the construction arithmetic") {
    // recompute the frame-0 aHash straight from the GIF recipe and compare
    val len = bigText.length
    val w = 1 + len % 16
    val h = 1 + (len / 16) % 16
    val gray = Array.tabulate(w * h)(i => bigText.charAt(i % len).toInt)
    val tripled = gray.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    val (hi, lo) = Multimodal.aHash(tripled)
    val got = hashes(1L -> bigText) // asset 2, no variant
      .filter(col("frame_idx") === 0).select("hi", "lo").head()
    assert(got == Row(hi, lo))
  }
}
