package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Targeted-erasure semantics (Loader.eraseTargeted), including the case
  * the declared p_targeted_delete fixture never produces: a partition whose
  * rows are ALL targeted. Dynamic partition overwrite cannot delete an
  * emptied partition (it only rewrites partitions that receive rows), so
  * without the explicit drop the "erased" rows would silently survive. */
class ErasureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(n: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS $n")
    n
  }

  private def sourceDf = Seq(
    // day d1: mixed — user 0 targeted, users 1/2 survive
    (1L, 0L, 10.0, "2024-01-01"),
    (2L, 1L, 20.0, "2024-01-01"),
    (3L, 2L, 30.0, "2024-01-01"),
    // day d2: FULLY targeted — zero survivors, partition must be dropped
    (4L, 0L, 40.0, "2024-01-02"),
    (5L, 0L, 50.0, "2024-01-02"),
    // day d3: untouched — must not be rewritten at all
    (6L, 3L, 60.0, "2024-01-03")
  ).toDF("event_id", "user_id", "value", "day")

  test("erasure drops a fully-targeted partition instead of leaving it stale") {
    val t = freshTable("erasure_spec_full")
    sourceDf.write.partitionBy("day").format("parquet").saveAsTable(t)
    Loader.eraseTargeted(spark, sourceDf, t, col("user_id") === 0L, "day")
    val out = spark.table(t).orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(out == Seq((2L, "2024-01-01"), (3L, "2024-01-01"),
      (6L, "2024-01-03")),
      s"fully-targeted day 2024-01-02 must vanish entirely, got $out")
    // the partition itself is gone from the catalog, not just empty
    val parts = spark.sql(s"SHOW PARTITIONS $t")
      .collect().map(_.getString(0)).toSeq.sorted
    assert(parts == Seq("day=2024-01-01", "day=2024-01-03"), parts.toString)
  }

  test("erasure is idempotent and leaves untargeted partitions byte-stable") {
    val t = freshTable("erasure_spec_idem")
    sourceDf.write.partitionBy("day").format("parquet").saveAsTable(t)
    Loader.eraseTargeted(spark, sourceDf, t, col("user_id") === 0L, "day")
    val first = spark.table(t).orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    Loader.eraseTargeted(spark, sourceDf, t, col("user_id") === 0L, "day")
    val second = spark.table(t).orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    assert(first == second, "second erasure run must be a no-op")
  }

  test("erasure with no targeted rows touches nothing") {
    val t = freshTable("erasure_spec_none")
    sourceDf.write.partitionBy("day").format("parquet").saveAsTable(t)
    Loader.eraseTargeted(spark, sourceDf, t, col("user_id") === 999L, "day")
    assert(spark.table(t).count() == 6)
    val parts = spark.sql(s"SHOW PARTITIONS $t").count()
    assert(parts == 3)
  }
}
