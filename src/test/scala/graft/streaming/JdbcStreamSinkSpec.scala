package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming → JDBC reporting sink: micro-batches insert-if-absent on the
  * PK, so replayed input (the at-least-once case) and cross-batch
  * duplicates land exactly once — the reference's Postgres reporting table
  * fed continuously. */
class JdbcStreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("foreachBatch JDBC dedupAppend is exactly-once under replayed input") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val db = "graft_stream" + System.nanoTime()
    val url = s"jdbc:derby:memory:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE event_rpt (
             event_id BIGINT NOT NULL PRIMARY KEY,
             user_id BIGINT, ts TIMESTAMP)""")
      val ms = MemoryStream[(Long, Long, Timestamp)]
      val q = EventsStream.streamIntoJdbc(
        ms.toDF().toDF("event_id", "user_id", "ts"),
        url, "event_rpt", Seq("event_id"))
      try {
        def ts(s: String) = Timestamp.valueOf(s)
        ms.addData((1L, 10L, ts("2024-01-01 10:00:00")),
                   (2L, 11L, ts("2024-01-01 10:01:00")))
        q.processAllAvailable()
        // replay event 2 (at-least-once source) + a fresh event 3
        ms.addData((2L, 11L, ts("2024-01-01 10:01:00")),
                   (3L, 12L, ts("2024-01-01 10:02:00")))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.read.jdbc(url, "event_rpt", new java.util.Properties)
        .collect().map(r => r.getLong(0)).sorted.toSeq
      assert(rows == Seq(1L, 2L, 3L), s"replay must not duplicate: $rows")
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLNonTransientConnectionException => () }
    }
  }
}
