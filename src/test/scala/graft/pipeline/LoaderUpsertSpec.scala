package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Managed-table MERGE semantics (SURVEY.md §7 "Upsert gap"): matched PKs
  * take the incoming payload, absent PKs insert, re-applying the same batch
  * is a no-op; the partition-scoped variant rewrites only touched
  * partitions. */
class LoaderUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private var n = 0
  private def freshTable(partitioned: Boolean): String = {
    n += 1
    val t = s"upsert_spec_$n${if (partitioned) "_p" else ""}"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    if (partitioned)
      spark.sql(s"""CREATE TABLE $t (run_id STRING, state STRING, score DOUBLE,
                    day STRING) USING parquet PARTITIONED BY (day)""")
    else
      spark.sql(s"CREATE TABLE $t (run_id STRING, state STRING, score DOUBLE) USING parquet")
    t
  }

  test("upsert: update matched, insert absent, idempotent re-apply") {
    val t = freshTable(partitioned = false)
    Seq(("r1", "running", 1.0), ("r2", "queued", 2.0))
      .toDF("run_id", "state", "score")
      .write.mode("append").insertInto(t)
    val re = Seq(("r1", "success", 5.0), ("r3", "running", 3.0))
      .toDF("run_id", "state", "score")
    Loader.upsert(spark, re, t, Seq("run_id"))
    Loader.upsert(spark, re, t, Seq("run_id"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq(("r1", "success", 5.0), ("r2", "queued", 2.0),
      ("r3", "running", 3.0)))
  }

  test("upsert resolves in-batch duplicate PKs by preference (last extract wins)") {
    val t = freshTable(partitioned = false)
    val batch = Seq(("r1", "old", 1.0, "page1"), ("r1", "new", 2.0, "page2"))
      .toDF("run_id", "state", "score", "page")
    Loader.upsert(spark, batch, t, Seq("run_id"),
      preference = Seq(col("page").desc))
    assert(spark.table(t).collect().map(_.getString(1)).toSeq == Seq("new"))
  }

  test("upsertPartitioned rewrites only the partitions the batch touches") {
    val t = freshTable(partitioned = true)
    Seq(("r1", "running", 1.0, "d1"), ("r2", "queued", 2.0, "d2"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    val d1Files = spark.table(t).filter(col("day") === "d1")
      .inputFiles.toSet
    val d2FilesBefore = spark.table(t).filter(col("day") === "d2")
      .inputFiles.toSet
    // batch touches only d2: r2 mutates, r3 inserts
    val re = Seq(("r2", "success", 9.0, "d2"), ("r3", "running", 3.0, "d2"))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq(("r1", "running", "d1"), ("r2", "success", "d2"),
      ("r3", "running", "d2")))
    // d1's physical files are untouched; d2's were rewritten
    assert(spark.table(t).filter(col("day") === "d1").inputFiles.toSet == d1Files)
    assert(spark.table(t).filter(col("day") === "d2").inputFiles.toSet
      != d2FilesBefore)
  }

  test("upsertPartitioned fails fast past the touched-partition cap, with guidance") {
    val t = freshTable(partitioned = true)
    Seq(("r1", "running", 1.0, "d1"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    // batch touches 3 partitions; cap of 2 must reject BEFORE any write
    val re = Seq(("r1", "success", 9.0, "d2"), ("r2", "running", 3.0, "d3"),
      ("r3", "queued", 4.0, "d4"))
      .toDF("run_id", "state", "score", "day")
    val e = intercept[IllegalArgumentException] {
      Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"),
        maxTouchedPartitions = 2L)
    }
    assert(e.getMessage.contains("touches") &&
      e.getMessage.contains("over-partitioning"))
    // target unchanged — the guard fired before the staged overwrite
    assert(spark.table(t).collect().map(_.getString(1)).toSeq == Seq("running"))
    // same batch under the default cap applies cleanly
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    assert(spark.table(t).count() == 3)
  }

  test("dedupAppendBloom equals dedupAppend: empty target, FP-heavy sketch, idempotent") {
    val t1 = freshTable(partitioned = false)
    val t2 = freshTable(partitioned = false)
    val batch1 = Seq(("r1", "running", 1.0), ("r2", "queued", 2.0))
      .toDF("run_id", "state", "score")
    // empty target: bloom aggregate returns null → plain path
    Loader.dedupAppend(spark, batch1, t1, Seq("run_id"))
    Loader.dedupAppendBloom(spark, batch1, t2, Seq("run_id"))
    // overlapping re-extract with a saturated 256-bit sketch: every row
    // flags maybe-dup, the exact anti join must still clear the FPs
    val batch2 = Seq(("r2", "success", 9.0), ("r3", "running", 3.0))
      .toDF("run_id", "state", "score")
    Loader.dedupAppend(spark, batch2, t1, Seq("run_id"))
    Loader.dedupAppendBloom(spark, batch2, t2, Seq("run_id"),
      expectedItems = 4L, numBits = 256L)
    Loader.dedupAppendBloom(spark, batch2, t2, Seq("run_id")) // idempotent
    val a = spark.table(t1).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val b = spark.table(t2).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(a == b && a == Seq(("r1", "running"), ("r2", "queued"), ("r3", "running")))
  }

  test("conformToTable fills missing nullable columns, drops extras, rejects missing required") {
    val t = freshTable(partitioned = false)
    // batch predates the table's `score` column and carries a stray column
    val batch = Seq(("r1", "running", "stray"))
      .toDF("run_id", "state", "not_in_table")
    val conformed = Loader.conformToTable(spark, batch, t)
    assert(conformed.columns.toSeq == Seq("run_id", "state", "score"))
    Loader.dedupAppend(spark, conformed, t, Seq("run_id"))
    val r = spark.table(t).first()
    assert(r.getString(0) == "r1" && r.isNullAt(2))
    // a non-nullable target column missing from the batch must still fail
    // (schema-level: Spark parquet tables report all columns nullable, so
    // the guard matters for sinks with real constraints)
    import org.apache.spark.sql.types._
    val strict = StructType(Seq(
      StructField("run_id", StringType, nullable = false),
      StructField("state", StringType)))
    val e = intercept[IllegalArgumentException] {
      Loader.conformToSchema(Seq("x").toDF("state"), strict)
    }
    assert(e.getMessage.contains("run_id"))
  }

  test("upsertPartitioned drops emptied DATE partitions (quoted partition spec)") {
    n += 1
    val t = s"upsert_spec_${n}_d"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (run_id STRING, state STRING, day DATE)
                  USING parquet PARTITIONED BY (day)""")
    Seq(("r1", "running", java.sql.Date.valueOf("2024-01-01")),
        ("r2", "queued", java.sql.Date.valueOf("2024-01-02")))
      .toDF("run_id", "state", "day")
      .write.mode("append").insertInto(t)
    // r1 moves from Jan 1 to Jan 2 → the Jan 1 partition empties and its
    // DROP PARTITION spec must quote the date literal
    val re = Seq(("r1", "success", java.sql.Date.valueOf("2024-01-02")))
      .toDF("run_id", "state", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDate(2).toString)).toSeq
    assert(out == Seq(("r1", "success", "2024-01-02"), ("r2", "queued", "2024-01-02")))
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
      == Set("day=2024-01-02"))
  }

  test("upsertPartitioned removes the stale row when a PK moves partitions") {
    val t = freshTable(partitioned = true)
    Seq(("r1", "running", 1.0, "d1"), ("r2", "queued", 2.0, "d2"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    // re-extract moves r1 from d1 to d3: the old d1 row must not survive
    val re = Seq(("r1", "success", 9.0, "d3"))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq(("r1", "success", "d3"), ("r2", "queued", "d2")))
  }

  test("upsertPartitioned null partition: surviving rows outlive a write into it") {
    val t = freshTable(partitioned = true)
    // r0 has no partition value yet (late-arriving dimension) and must
    // SURVIVE a batch that writes other rows into the same null partition —
    // a null-unsafe semi join would silently destroy it in the overwrite
    Seq(("r0", "queued", 0.5, null: String), ("r2", "queued", 2.0, "d2"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    val re = Seq(("r1", "running", 1.0, null: String))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq(("r0", "queued", null), ("r1", "running", null),
      ("r2", "queued", "d2")))
    // and updating a PK in place inside the null partition keeps the rest
    val re2 = Seq(("r0", "success", 9.0, null: String))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re2, t, Seq("run_id"), Seq("day"))
    val out2 = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out2 == Seq(("r0", "success", null), ("r1", "running", null),
      ("r2", "queued", "d2")))
  }

  test("upsertPartitioned drops an emptied null partition via the Hive sentinel") {
    val t = freshTable(partitioned = true)
    Seq(("r1", "running", 1.0, null: String), ("r2", "queued", 2.0, "d2"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    // r1 acquires a real partition value → the null partition empties and
    // must be dropped (spec addresses it as '__HIVE_DEFAULT_PARTITION__'),
    // not left holding the stale duplicate
    val re = Seq(("r1", "success", 9.0, "d2"))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq(("r1", "success", "d2"), ("r2", "queued", "d2")))
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
      == Set("day=d2"))
  }

  test("conformToSchema enforces JDBC DDL NOT NULL via constrainedSchema (Derby)") {
    // the real-constraint sink case the conformToTable test can't cover:
    // parquet tables report every column nullable, and spark.read.jdbc
    // deliberately erases remote constraints too (alwaysNullable) — the
    // DDL truth is recovered by JdbcSink.constrainedSchema from driver
    // metadata, and conformToSchema then rejects bad batches pre-write
    val db = "graft_conform" + System.nanoTime()
    val url = s"jdbc:derby:memory:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        """CREATE TABLE strict_sink (
             run_id VARCHAR(50) NOT NULL, state VARCHAR(50) NOT NULL,
             score DOUBLE)""")
      // baseline: the plain JDBC read reports everything nullable
      assert(spark.read.jdbc(url, "strict_sink", new java.util.Properties)
        .schema.fields.forall(_.nullable))
      val strict = JdbcSink.constrainedSchema(spark, url, "strict_sink")
      val byName = strict.fields.map(f => f.name -> f.nullable).toMap
      assert(byName == Map("RUN_ID" -> false, "STATE" -> false,
        "SCORE" -> true), s"DDL nullability not recovered: $byName")
      // batch missing the NOT NULL `state` column → rejected by name
      val e = intercept[IllegalArgumentException] {
        Loader.conformToSchema(Seq(("r1", 1.0)).toDF("RUN_ID", "SCORE"), strict)
      }
      assert(e.getMessage.contains("STATE"))
      // batch missing only the nullable column conforms with a typed NULL
      val ok = Loader.conformToSchema(
        Seq(("r1", "running")).toDF("RUN_ID", "STATE"), strict)
      assert(ok.columns.toSeq == Seq("RUN_ID", "STATE", "SCORE"))
      assert(ok.first().isNullAt(2))
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$db;drop=true")
      catch { case _: java.sql.SQLNonTransientConnectionException => () }
    }
  }

  test("applyCdc: latest-seq wins; I->D nets absent; D->I reinserts; D on absent no-op") {
    val t = freshTable(partitioned = false)
    Seq(("r1", "running", 1.0), ("r2", "queued", 2.0))
      .toDF("run_id", "state", "score")
      .write.mode("append").insertInto(t)
    val changes = Seq(
      ("U", 1L, "r1", "success", 9.0),   // plain update
      ("D", 1L, "r2", null, 0.0),        // delete existing
      ("I", 1L, "r3", "queued", 3.0),    // insert then update: seq 2 wins
      ("U", 2L, "r3", "running", 3.5),
      ("I", 1L, "r4", "queued", 4.0),    // insert then delete: nets absent
      ("D", 2L, "r4", null, 0.0),
      ("D", 1L, "r9", null, 0.0)         // delete of a PK never present
    ).toDF("op", "seq", "run_id", "state", "score")
    Loader.applyCdc(spark, changes, t, Seq("run_id"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq(("r1", "success", 9.0), ("r3", "running", 3.5)))
    // replaying the same batch is idempotent (at-least-once change log)
    Loader.applyCdc(spark, changes, t, Seq("run_id"))
    val out2 = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out2 == out)
  }

  test("upsertPartitioned drops a partition fully superseded with no new rows") {
    val t = freshTable(partitioned = true)
    Seq(("r1", "running", 1.0, "d1"), ("r1b", "running", 1.5, "d1"),
        ("r2", "queued", 2.0, "d2"))
      .toDF("run_id", "state", "score", "day")
      .write.mode("append").insertInto(t)
    // every d1 row moves to d2 → d1 stages zero rows and must be dropped,
    // not left holding the stale copies
    val re = Seq(("r1", "success", 9.0, "d2"), ("r1b", "success", 9.5, "d2"))
      .toDF("run_id", "state", "score", "day")
    Loader.upsertPartitioned(spark, re, t, Seq("run_id"), Seq("day"))
    val out = spark.table(t).orderBy("run_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(3))).toSeq
    assert(out == Seq(("r1", "success", "d2"), ("r1b", "success", "d2"),
      ("r2", "queued", "d2")))
    assert(spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSet
      == Set("day=d2"))
  }
}
