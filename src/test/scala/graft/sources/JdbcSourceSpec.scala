package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Parallel JDBC extraction against embedded Derby: partition fan-out,
  * content equality with the plain read, filter pushdown into the remote,
  * and the empty-table fallback. */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDb(): String =
    s"jdbc:derby:memory:src${java.util.UUID.randomUUID().toString.replace("-", "")};create=true"

  private def seed(url: String, rows: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE t (id INT NOT NULL, val DOUBLE, PRIMARY KEY (id))")
      val ps = conn.prepareStatement("INSERT INTO t VALUES (?, ?)")
      (1 to rows).foreach { i =>
        ps.setInt(1, i); ps.setDouble(2, i * 1.5); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("auto-bounded partitioned read fans out and loses nothing") {
    val url = freshDb()
    seed(url, 100)
    val df = JdbcSource.readPartitionedAuto(spark, url, "t", "id", 5)
    assert(df.rdd.getNumPartitions == 5, "one range scan per partition")
    assert(df.count() == 100)
    assert(df.agg(sum(col("id"))).first().getLong(0) == 5050L)
    // every partition non-degenerate: stride bounds cover the value space
    val perPart = df.rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPart.sum == 100 && perPart.forall(_ > 0), perPart.toSeq.toString)
  }

  test("filters and projection push into the remote database") {
    val url = freshDb()
    seed(url, 50)
    val df = JdbcSource.readPartitionedAuto(spark, url, "t", "id", 4)
      .filter(col("id") < 10).select("id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      plan.take(500))
    assert(df.count() == 9)
  }

  test("non-identifier table/column names are rejected before any SQL runs") {
    val url = freshDb()
    seed(url, 5)
    // injection shapes must die at validation, not reach the probe
    intercept[IllegalArgumentException] {
      JdbcSource.readPartitionedAuto(spark, url, "t; DROP TABLE t", "id", 2)
    }
    intercept[IllegalArgumentException] {
      JdbcSource.readPartitionedAuto(spark, url, "t", "id) FROM t--", 2)
    }
    // pre-quoted reserved-word style names pass validation (Derby resolves
    // the quoted-uppercase form of the unquoted-created table)
    assert(JdbcSource.readPartitionedAuto(spark, url, "\"T\"", "\"ID\"", 2)
      .count() == 5)
  }

  test("empty table falls back to a plain read") {
    val url = freshDb()
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE t (id INT NOT NULL, val DOUBLE)")
    finally conn.close()
    assert(JdbcSource.readPartitionedAuto(spark, url, "t", "id", 4).count() == 0)
  }
}
