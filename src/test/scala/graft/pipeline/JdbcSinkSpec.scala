package graft.pipeline

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JDBC sink semantics against embedded Derby: insert-if-absent idempotence
  * (the reference's Postgres target, gcs_to_postgres.py:178-181) and
  * update-on-conflict including the batched-UPDATE path. */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDb(): String = {
    val url = "jdbc:derby:memory:sinkspec" +
      java.util.UUID.randomUUID().toString.replace("-", "") + ";create=true"
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE runs (
           run_id VARCHAR(64) NOT NULL PRIMARY KEY,
           state VARCHAR(32), score DOUBLE, seen_at TIMESTAMP)""")
    finally conn.close()
    url
  }

  private def readBack(url: String) = {
    // Derby reports uppercase column names; Row.getAs is case-sensitive
    val df = spark.read.jdbc(url, "runs", new Properties)
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  private def df(rows: (String, String, Double)*) =
    rows.toSeq.map { case (id, st, sc) =>
      (id, st, sc, java.sql.Timestamp.valueOf("2022-03-01 00:00:00"))
    }.toDF("run_id", "state", "score", "seen_at")

  test("dedupAppend inserts once; re-running the same batch is a no-op") {
    val url = freshDb()
    val batch = df(("r1", "running", 1.0), ("r2", "queued", 2.0))
    JdbcSink.dedupAppend(spark, batch, url, "runs", Seq("run_id"))
    JdbcSink.dedupAppend(spark, batch, url, "runs", Seq("run_id"))
    assert(readBack(url).count() == 2)
  }

  test("dedupAppend keeps existing payloads (insert-if-absent, not update)") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark, df(("r1", "running", 1.0)), url, "runs", Seq("run_id"))
    JdbcSink.dedupAppend(spark, df(("r1", "success", 9.0)), url, "runs", Seq("run_id"))
    val r = readBack(url).filter(col("run_id") === "r1").first()
    assert(r.getAs[String]("state") == "running")
  }

  test("upsert updates matched PKs, inserts absent ones, and stays idempotent") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark,
      df(("r1", "running", 1.0), ("r2", "queued", 2.0)), url, "runs", Seq("run_id"))
    val reExtract = df(("r1", "success", 5.0), ("r3", "running", 3.0))
    JdbcSink.upsert(spark, reExtract, url, "runs", Seq("run_id"))
    JdbcSink.upsert(spark, reExtract, url, "runs", Seq("run_id"))
    val out = readBack(url).orderBy("run_id").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getAs[String]("run_id"), r.getAs[String]("state"),
      r.getAs[Double]("score"))).toSeq ==
      Seq(("r1", "success", 5.0), ("r2", "queued", 2.0), ("r3", "running", 3.0)))
  }

  test("upsert survives small batch sizes (multi-flush UPDATE batching) and null payloads") {
    val url = freshDb()
    val initial = (1 to 25).map(i => (s"r$i", "running", i.toDouble))
    JdbcSink.dedupAppend(spark, df(initial: _*), url, "runs", Seq("run_id"))
    val mutated = (1 to 25).map(i => (s"r$i", "success", i * 10.0))
    val withNull = df(mutated: _*)
      .withColumn("seen_at", org.apache.spark.sql.functions.lit(null).cast("timestamp"))
    JdbcSink.upsert(spark, withNull, url, "runs", Seq("run_id"), batchSize = 4)
    val out = readBack(url)
    assert(out.count() == 25)
    assert(out.filter(col("state") =!= "success").count() == 0)
    assert(out.filter(col("seen_at").isNotNull).count() == 0)
  }

  test("in-batch duplicate PKs resolve by preference order") {
    val url = freshDb()
    val batch = Seq(
      ("r1", "old", 1.0, "page1"),
      ("r1", "new", 2.0, "page2"))
      .toDF("run_id", "state", "score", "page")
      .withColumn("seen_at",
        org.apache.spark.sql.functions.lit(java.sql.Timestamp.valueOf("2022-03-01 00:00:00")))
    JdbcSink.dedupAppend(spark, batch, url, "runs", Seq("run_id"),
      preference = Seq(col("page").desc))
    val r = readBack(url).first()
    assert(r.getAs[String]("state") == "new")
  }

  test("applyCdcAtomic: same net state as applyCdc, via the staged swap") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark, df(("r1", "running", 1.0), ("r2", "queued", 2.0)),
      url, "runs", Seq("run_id"))
    val ts = java.sql.Timestamp.valueOf("2022-03-02 00:00:00")
    val changes = Seq(
      ("U", 1L, "r1", "success", 9.0, ts),
      ("D", 1L, "r2", null, 0.0, ts),
      ("I", 1L, "r4", "queued", 4.0, ts)
    ).toDF("op", "seq", "run_id", "state", "score", "seen_at")
    JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id"))
    JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id")) // replay
    val out = readBack(url).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[String]("state")).toMap
    assert(out == Map("r1" -> "success", "r4" -> "queued"))
  }

  test("applyCdcAtomic: a mid-swap crash rolls back to the pre-batch table") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark, df(("r1", "running", 1.0), ("r2", "queued", 2.0)),
      url, "runs", Seq("run_id"))
    val ts = java.sql.Timestamp.valueOf("2022-03-02 00:00:00")
    val changes = Seq(
      ("U", 1L, "r1", "success", 9.0, ts),
      ("D", 1L, "r2", null, 0.0, ts)
    ).toDF("op", "seq", "run_id", "state", "score", "seen_at")
    // failpoint fires AFTER the swap's DELETE has executed — without the
    // enclosing transaction this is exactly applyCdc's visibility window
    val boom = intercept[RuntimeException] {
      JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id"),
        failpoint = () => throw new RuntimeException("crash between DELETE and INSERT"))
    }
    assert(boom.getMessage.contains("crash between"))
    val out = readBack(url).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[String]("state")).toMap
    assert(out == Map("r1" -> "running", "r2" -> "queued"),
      "rollback must restore the pre-batch table, not leave the deleted sliver")
    // and the retry completes the batch
    JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id"))
    val after = readBack(url).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[String]("state")).toMap
    assert(after == Map("r1" -> "success"))
  }

  test("applyCdcAtomic: a crash between stage-load and swap leaves the target untouched") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark, df(("r1", "running", 1.0), ("r2", "queued", 2.0)),
      url, "runs", Seq("run_id"))
    val ts = java.sql.Timestamp.valueOf("2022-03-02 00:00:00")
    val changes = Seq(
      ("U", 1L, "r1", "success", 9.0, ts),
      ("D", 1L, "r2", null, 0.0, ts),
      ("I", 1L, "r4", "queued", 4.0, ts)
    ).toDF("op", "seq", "run_id", "state", "score", "seen_at")
    // phase-1/phase-2 boundary: stages are fully loaded, the swap
    // transaction has NOT opened — the atomicity contract says staging is
    // invisible, so the target must be byte-identical to pre-batch
    val boom = intercept[RuntimeException] {
      JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id"),
        preSwapFailpoint = () => throw new RuntimeException("crash before swap"))
    }
    assert(boom.getMessage.contains("crash before swap"))
    val out = readBack(url).collect()
      .map(r => (r.getAs[String]("run_id"),
        r.getAs[String]("state"), r.getAs[Double]("score"))).toSet
    assert(out == Set(("r1", "running", 1.0), ("r2", "queued", 2.0)),
      "a pre-swap crash must not leak any staged row or delete into the target")
    // rerun with no failpoint: the stage overwrite + idempotent swap
    // complete the batch as if the crash never happened
    JdbcSink.applyCdcAtomic(spark, changes, url, "runs", Seq("run_id"))
    val after = readBack(url).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[String]("state")).toMap
    assert(after == Map("r1" -> "success", "r4" -> "queued"))
  }

  test("applyCdc: upserts non-D latest, batch-DELETEs D latest, idempotent") {
    val url = freshDb()
    JdbcSink.dedupAppend(spark, df(("r1", "running", 1.0), ("r2", "queued", 2.0)),
      url, "runs", Seq("run_id"))
    val ts = java.sql.Timestamp.valueOf("2022-03-02 00:00:00")
    val changes = Seq(
      ("U", 1L, "r1", "success", 9.0, ts),  // update existing
      ("D", 1L, "r2", null, 0.0, ts),       // delete existing
      ("I", 1L, "r3", "queued", 3.0, ts),   // insert then delete: absent
      ("D", 2L, "r3", null, 0.0, ts),
      ("D", 1L, "r9", null, 0.0, ts)        // delete of absent PK: no-op
    ).toDF("op", "seq", "run_id", "state", "score", "seen_at")
    JdbcSink.applyCdc(spark, changes, url, "runs", Seq("run_id"))
    JdbcSink.applyCdc(spark, changes, url, "runs", Seq("run_id")) // replay
    val out = readBack(url).collect()
      .map(r => r.getAs[String]("run_id") -> r.getAs[String]("state")).toMap
    assert(out == Map("r1" -> "success"))
  }
}
