package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Compaction must be a pure physical rewrite: row sets identical, victim
  * partitions collapse to one file, partitions under the threshold keep
  * their exact files. */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compactPartitions rewrites only fragmented partitions, 1 file each") {
    val t = "maint_spec_p"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"""CREATE TABLE $t (run_id STRING, score DOUBLE, day STRING)
                  USING parquet PARTITIONED BY (day)""")
    // d1 fragments across 4 append batches; d2 gets exactly one
    (1 to 4).foreach { i =>
      Seq((s"r$i", i.toDouble, "d1")).toDF("run_id", "score", "day")
        .coalesce(1).write.mode("append").insertInto(t)
    }
    Seq(("s1", 0.5, "d2")).toDF("run_id", "score", "day")
      .coalesce(1).write.mode("append").insertInto(t)
    val before = spark.table(t).orderBy("run_id").collect().toSeq
    val d2Files = spark.table(t).filter(col("day") === "d2").inputFiles.toSet
    val stats0 = Maintenance.fileStats(spark, t, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats0 == Map("d1" -> 4L, "d2" -> 1L))

    val n = Maintenance.compactPartitions(spark, t, Seq("day"), maxFiles = 2)
    assert(n == 1)
    val stats1 = Maintenance.fileStats(spark, t, Seq("day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats1 == Map("d1" -> 1L, "d2" -> 1L))
    // d2's physical file untouched; rows byte-identical overall
    assert(spark.table(t).filter(col("day") === "d2").inputFiles.toSet == d2Files)
    assert(spark.table(t).orderBy("run_id").collect().toSeq == before)
    // idempotent: nothing above threshold remains
    assert(Maintenance.compactPartitions(spark, t, Seq("day"), maxFiles = 2) == 0)
  }

  test("flat compact preserves rows and hits the requested file count") {
    val t = "maint_spec_flat"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (run_id STRING, score DOUBLE) USING parquet")
    (1 to 5).foreach { i =>
      Seq((s"r$i", i.toDouble)).toDF("run_id", "score")
        .coalesce(1).write.mode("append").insertInto(t)
    }
    val before = spark.table(t).orderBy("run_id").collect().toSeq
    assert(spark.table(t).inputFiles.length == 5)
    Maintenance.compact(spark, t, numFiles = 1)
    assert(spark.table(t).inputFiles.length == 1)
    assert(spark.table(t).orderBy("run_id").collect().toSeq == before)
  }
}
