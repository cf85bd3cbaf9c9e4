package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of join semantics on crafted boundaries the oracle query can't
  * isolate: inclusive equal-timestamp match, no-prior-row nulls, and key
  * isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("equal timestamps match (inclusive); earlier rows win otherwise; no prior → null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3"))
      .toDF("k", "t", "lname")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "R_at_10"),
      (1L, ts("2024-01-01 11:00:00"), "R_at_11"),
      (2L, ts("2024-01-01 09:30:00"), "R_at_0930"))
      .toDF("k", "t", "rname")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t")
      .select("k", "lname", "rname")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, "L1", Some("R_at_10")),   // equal timestamp: inclusive
      (1L, "L2", Some("R_at_11")),   // latest at-or-before wins
      (2L, "L3", None)))             // right row is after the left → no match
  }

  test("tolerance works on integral epoch-micros time columns, not just timestamps") {
    val left = Seq((1L, 10_000_000L, "L1"), (1L, 90_000_000L, "L2"))
      .toDF("k", "t", "lname")
    val right = Seq((1L, 9_000_000L, "R9"))
      .toDF("k", "t", "rname")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
        toleranceUs = Some(5_000_000L))
      .select("k", "lname", "rname")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSet
    // L1 is 1s after R9 (inside 5s tolerance); L2 is 81s after (stale)
    assert(got == Set((1L, "L1", Some("R9")), (1L, "L2", None)))
  }

  test("forward as-of picks the earliest at-or-after row, inclusive at equal time") {
    val left = Seq((1L, 10_000_000L, "L1"), (1L, 12_000_000L, "L2"),
        (2L, 50_000_000L, "L3"))
      .toDF("k", "t", "lname")
    val right = Seq((1L, 10_000_000L, "R_at_10"), (1L, 11_000_000L, "R_at_11"),
        (2L, 40_000_000L, "R_before"))
      .toDF("k", "t", "rname")
    val got = AsOfJoin.asofJoinForward(left, right, Seq("k"), "t", "t")
      .select("k", "lname", "rname")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got == Set(
      (1L, "L1", Some("R_at_10")),   // equal timestamp: inclusive
      (1L, "L2", None),              // only earlier rows exist → no match
      (2L, "L3", None)))             // right row is BEFORE the left → no match
  }

  test("tolerance on a non-time-typed column is rejected with a clear error") {
    val left = Seq((1L, "a", "L1")).toDF("k", "t", "lname")
    val right = Seq((1L, "a", "R1")).toDF("k", "t", "rname")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t",
        toleranceUs = Some(1L)).collect()
    }
    assert(e.getMessage.contains("toleranceUs"))
  }
}
