package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The observe() metrics API — pipeline observability without a second
  * scan: named aggregates piggyback on the query's own execution and are
  * collected from the listener after the action, the mechanism behind
  * row-count/quality gauges on production jobs (a separate count() would
  * re-read the input). */
class ObserveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("batch observe() metrics equal a direct aggregate, at zero extra scans") {
    val obs = Observation("orders_gauge")
    val orders = Tables.load(spark, dir, "orders")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"))
    // the observed metrics ride the SAME job as this aggregation
    val loaded = orders.groupBy("o_orderstatus").count().collect()
    val m = obs.get
    val direct = Tables.load(spark, dir, "orders")
      .agg(count(lit(1)), sum(col("o_totalprice").cast(DecimalType(18, 2))),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)))
      .first()
    assert(m("n_rows") == direct.getLong(0))
    assert(m("revenue") == direct.getDecimal(1))
    assert(m("n_f") == direct.getLong(2))
    assert(loaded.map(_.getLong(1)).sum == direct.getLong(0))
  }

  test("streaming observe() metrics surface per batch in query progress") {
    val ev = graft.streaming.EventsStream.readEvents(spark, dir)
      .observe("events_gauge",
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"))
    val q = ev.groupBy("event_type").count()
      .writeStream.format("memory").queryName("observe_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val metrics = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("events_gauge")))
      assert(metrics.nonEmpty, "observed metrics must appear in progress")
      val total = metrics.map(_.getLong(0)).sum
      val expected = Tables.load(spark, dir, "events").count()
      assert(total == expected,
        s"per-batch observed rows must sum to the input ($total vs $expected)")
    } finally q.stop()
  }
}
