package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams", ICDT'05) as a
  * typed Aggregator — bounded-state frequent-item detection for streams and
  * 100 TB groupless scans where an exact `groupBy(item)` would shuffle the
  * full key universe.
  *
  * Invariants (the published guarantees, asserted in SpaceSavingSpec):
  *  - any item with true frequency > n/k is in the sketch;
  *  - for every tracked item: est - err <= true <= est;
  *  - total tracked count mass equals the processed row count when no
  *    eviction occurred, and est overshoot is bounded by the min counter.
  *
  * When `k` >= the number of distinct items, no eviction ever happens and
  * every (count, err=0) is EXACT — the declared query (q_heavy_hitters)
  * exercises the sketch in that regime so a plain SQL GROUP BY oracle
  * hash-checks it; the eviction regime is covered by property tests.
  *
  * Merge is the counter-wise sum with cross-sketch error transfer: items
  * absent from one side may have occurred up to that side's min-counter
  * times, so the bound degrades by exactly that amount (Agarwal et al.,
  * "Mergeable Summaries", PODS'12 treatment). With no evictions on either
  * side both mins are 0 and the merge is the exact sum.
  */
class SpaceSaving(k: Int)
  extends Aggregator[String, Map[String, (Long, Long)], Array[(String, Long, Long)]] {

  override def zero: Map[String, (Long, Long)] = Map.empty

  private def minCounter(buf: Map[String, (Long, Long)]): (String, Long) =
    buf.iterator.map { case (i, (c, _)) => (i, c) }.minBy(_._2)

  override def reduce(buf: Map[String, (Long, Long)], value: String)
      : Map[String, (Long, Long)] =
    if (value == null) buf
    else buf.get(value) match {
      case Some((c, e)) => buf.updated(value, (c + 1, e))
      case None if buf.size < k => buf.updated(value, (1L, 0L))
      case None =>
        // evict the min counter: the newcomer inherits its count as both
        // estimate base and error bound — the Space-Saving replacement rule
        val (victim, m) = minCounter(buf)
        (buf - victim).updated(value, (m + 1, m))
    }

  override def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)])
      : Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // an item absent from a side may still have appeared up to that side's
    // min counter value times; only sides that ever evicted (size == k)
    // carry that uncertainty — an under-filled sketch saw every item
    val minA = if (a.size < k) 0L else minCounter(a)._2
    val minB = if (b.size < k) 0L else minCounter(b)._2
    val out = mutable.Map.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { i =>
      val (ca, ea) = a.getOrElse(i, (minA, minA))
      val (cb, eb) = b.getOrElse(i, (minB, minB))
      out(i) = (ca + cb, ea + eb)
    }
    // trim back to the k largest estimates (deterministic tie-break on the
    // item so partition merge order cannot change the survivor set)
    if (out.size <= k) out.toMap
    else out.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
      .map { case (i, ce) => i -> ce }.toMap
  }

  /** (item, est, err) sorted by est desc then item — a deterministic order
    * so downstream `explode` output is stable. */
  override def finish(buf: Map[String, (Long, Long)]): Array[(String, Long, Long)] =
    buf.toArray.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(String, Long, Long)]] = ExpressionEncoder()
}

object SpaceSaving {
  /** Column function: `df.agg(topK(64)(col("item")))` → array of
    * (item, est, err) structs. */
  def topK(k: Int) = udaf(new SpaceSaving(k))
}
