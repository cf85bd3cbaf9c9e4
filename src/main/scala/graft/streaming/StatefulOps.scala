package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state on top of flatMapGroupsWithState — the escape hatch for
  * stream logic windows/dedup can't express (per-key running aggregates,
  * custom eviction). State is per-key and incremental: at scale it lives in
  * the state store (RocksDB on a real cluster), never in executor heaps.
  */
object StatefulOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  case class TopEvent(event_type: String, event_id: Long, value: Double,
                      rank: Int)

  /** Streaming per-key top-k — the streaming twin of plans.TopKPerKey:
    * per event_type the k highest-value events seen so far (event_id
    * tie-break → total order), state BOUNDED at k rows per key forever
    * (the whole point: an unbounded stream, O(keys·k) state). Each batch
    * re-emits a key's current top-k only when that key saw rows
    * (OutputMode.Update). On a single-batch source the one emission per
    * key equals the batch top-k — the driver-gated contract (s_topk); the
    * multi-batch incremental merge is asserted in StreamingSpec. */
  def streamingTopKPerType(spark: SparkSession, events: DataFrame,
                           k: Int): Dataset[TopEvent] = {
    import spark.implicits._
    events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select("event_type", "event_id", "value")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Double, Long)], TopEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[Seq[(Double, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty)
              ++ rows.map(r => (r._3, r._2)))
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopEvent(etype, id, v, i + 1)
          }
      }
  }

  /** Running per-user totals, emitted on every update. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserTotals] = {
    import spark.implicits._
    events
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val buf = rows.foldLeft(prev)((acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.total_value + e.value))
          state.update(buf)
          Iterator.single(buf)
      }
  }
}
