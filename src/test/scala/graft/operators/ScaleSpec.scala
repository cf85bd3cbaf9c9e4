package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Scale-technique proofs: salting preserves join semantics; bucketed
  * tables join without a shuffle (the co-location story for the 100 TB
  * deployment, exercised on the session catalog). */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("saltedJoin returns exactly the rows of the plain equi-join") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    val plain = li.join(o, Seq("o_orderkey"))
    val salted = SkewJoin.saltedJoin(li, o, Seq("o_orderkey"), saltFactor = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("partition-column filters prune the scan to matching partitions only") {
    val db = "scale_probe_pp"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.load(spark, dir, "orders")
        .withColumn("status_part", col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("status_part")
        .saveAsTable(s"$db.orders_p")
      val q = spark.table(s"$db.orders_p").filter(col("status_part") === "F")
        .select("o_orderkey")
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      // pruning happens at planning: the file index exposes the partition
      // predicate, and only the matching partition directory is read
      assert(scan.contains("PartitionFilters"), scan.take(600))
      assert(scan.contains("status_part"), scan.take(600))
      val prunedFiles = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount }
      assert(prunedFiles.contains(1),
        s"expected exactly 1 of 3 status partitions, got $prunedFiles")
      assert(q.count() > 0)
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("bucketed tables sort-merge join without an exchange") {
    val db = "scale_probe"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        "bucketed-by-key tables must join without a shuffle:\n" + plan.take(800))
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
