package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Late-data policy under a real multi-batch watermark advance: rows behind
  * the watermark are dropped from append-mode windowed aggregation — the
  * streaming analog of the batch pipeline's "below the watermark is never
  * loaded" policy (SURVEY.md §2B Streaming). File-source replays process in
  * one batch and can't show this; MemoryStream feeds two batches. */
class LateDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("append-mode window agg drops rows behind the advanced watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val agg = ms.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_ts"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      // batch 1: events in hours 09 and 12 → watermark advances to 11:00
      ms.addData((1L, ts("2024-01-01 09:10:00"), 1.0),
                 (2L, ts("2024-01-01 09:20:00"), 1.0),
                 (3L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event for hour 09 (behind the 11:00 watermark) and
      // a fresh event at 14:00 (advances watermark past hour 12)
      ms.addData((4L, ts("2024-01-01 09:30:00"), 1.0),
                 (5L, ts("2024-01-01 14:00:00"), 1.0))
      q.processAllAvailable()
      // one more empty-ish advance so finalized windows flush
      ms.addData((6L, ts("2024-01-01 16:00:00"), 1.0))
      q.processAllAvailable()
      val out = spark.table("late_sink")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      // hour 09 finalized with 2 events — the late 4th was dropped
      assert(out("2024-01-01 09:00:00.0") == 2L,
        s"late row must not count: $out")
      // hour 12 finalized with its single event
      assert(out("2024-01-01 12:00:00.0") == 1L)
    } finally q.stop()
  }
}
