package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** I/U/D semantics of snapshot differencing: null-safe payload compare,
  * unchanged rows dropped, and the round trip — applying the derived
  * change set via CDC reproduces the new snapshot exactly. */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff emits I/U/D, drops unchanged, treats null payloads as values") {
    val old = Seq(
      ("k1", Some("a"), 1.0), // unchanged → dropped
      ("k2", Some("b"), 2.0), // payload change → U
      ("k3", None: Option[String], 3.0), // null → value: U
      ("k4", Some("d"), 4.0)  // absent in new → D
    ).toDF("id", "state", "score")
    val neu = Seq(
      ("k1", Some("a"), 1.0),
      ("k2", Some("B"), 2.0),
      ("k3", Some("c"), 3.0),
      ("k5", Some("e"), 5.0)  // absent in old → I
    ).toDF("id", "state", "score")
    val out = SnapshotDiff.diff(old, neu, Seq("id"))
      .select("id", "op").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("k2", "U"), ("k3", "U"), ("k4", "D"), ("k5", "I")))
    // null == null is NOT a change
    val same = SnapshotDiff.diff(
      Seq(("k1", None: Option[String])).toDF("id", "state"),
      Seq(("k1", None: Option[String])).toDF("id", "state"), Seq("id"))
    assert(same.count() == 0)
  }

  test("diff round trip: applyCdc of the change set reproduces the new snapshot") {
    val t = "snapdiff_rt"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id STRING, state STRING) USING parquet")
    val old = Seq(("k1", "a"), ("k2", "b"), ("k3", "c")).toDF("id", "state")
    val neu = Seq(("k2", "B"), ("k3", "c"), ("k4", "d")).toDF("id", "state")
    old.write.mode("append").insertInto(t)
    val changes = SnapshotDiff.diff(old, neu, Seq("id"))
      .select($"id", $"state_new".as("state"), $"op",
        org.apache.spark.sql.functions.monotonically_increasing_id().as("seq"))
      // applyCdc's op vocabulary: U upserts, D deletes, I inserts (≡ U)
    Loader.applyCdc(spark, changes, t, Seq("id"))
    val out = spark.table(t).orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(("k2", "B"), ("k3", "c"), ("k4", "d")))
  }
}
