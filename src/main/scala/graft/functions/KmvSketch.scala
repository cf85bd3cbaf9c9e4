package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * custom aggregation machinery (SURVEY.md §2B UDAF row) with a
  * deterministic md5 hash family, so unlike HLL the estimate is
  * reproducible in any engine: keep the k lexicographically smallest
  * distinct md5(value) hashes; if fewer than k distinct values exist the
  * count is exact, otherwise estimate (k-1)/frac(kth hash), where frac is
  * the first 12 hex digits read as a 48-bit fraction (exact in a double).
  *
  * Buffer is a sorted distinct Array[String] capped at k → mergeable,
  * bounded state (k·32 bytes per group) like any production sketch.
  */
class KmvDistinct(k: Int) extends Aggregator[String, Array[String], Double] {

  // hot path: reuse the ThreadLocal digest + table-driven hex from
  // NativeHashes instead of per-row JCA lookups and Formatter calls
  private def md5hex(s: String): String =
    NativeHashes.md5HexOf(s.getBytes("UTF-8"))

  override def zero: Array[String] = Array.empty

  override def reduce(buf: Array[String], value: String): Array[String] =
    if (value == null) buf else insert(buf, md5hex(value))

  private def insert(buf: Array[String], h: String): Array[String] = {
    val idx = java.util.Arrays.binarySearch(buf.asInstanceOf[Array[AnyRef]], h)
    if (idx >= 0) buf // already present (same value hashed before)
    else {
      val at = -idx - 1
      if (at >= k) buf // larger than the current k minima
      else {
        val out = new Array[String](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, out.length - at - 1)
        out
      }
    }
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[String]): Double =
    if (buf.length < k) buf.length.toDouble
    else {
      // first 12 hex digits as an exact 48-bit integer; 2^48 scaling of a
      // double is exact, so both engines compute the identical estimate
      // max(v,1): a k-th hash with 12 leading zero hex digits (adversarial
      // md5 prefix) must not divide by zero; the oracle guards identically
      val v = math.max(java.lang.Long.parseLong(buf(k - 1).substring(0, 12), 16), 1L)
      val est = ((k - 1).toDouble / v) * 281474976710656.0
      // half-up at 4 decimals, matching the oracle's round(x, 4) on positives
      math.floor(est * 10000.0 + 0.5) / 10000.0
    }

  override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** Column function: `df.agg(kmv(col("x").cast("string")))`. */
  def kmv(k: Int) = udaf(new KmvDistinct(k))
}
