package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
