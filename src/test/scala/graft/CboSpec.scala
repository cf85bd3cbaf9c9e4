package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer evidence: ANALYZE TABLE statistics must actually
  * reach Catalyst and change its estimates — the mechanism a 100 TB
  * deployment leans on for join ordering and broadcast decisions on
  * MANAGED tables (file-scan relations estimate from file sizes; catalog
  * relations estimate from these statistics).
  *
  * Scoped carefully: `spark.sql.cbo.enabled` is flipped only inside these
  * tests (the shared session default stays as Engine ships it), and the
  * tables live in the suite-local temp warehouse.
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def withCbo[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("ANALYZE TABLE row counts reach the optimizer's estimates") {
    val t = "cbo_orders"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.format("parquet").saveAsTable(t)
    val n = spark.table(t).count()
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
    withCbo {
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(n)),
        s"expected catalog rowCount $n in optimizer stats, got ${stats.rowCount}")
    }
  }

  test("column statistics shrink a filter's cardinality estimate") {
    val t = "cbo_orders_cols"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus")
      .write.format("parquet").saveAsTable(t)
    val n = spark.table(t).count()
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
    withCbo {
      val filtered = spark.table(t).filter(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined, "filter estimate lost the rowCount")
      val est = filtered.rowCount.get
      // 3 statuses → the NDV-based selectivity estimate must be a real
      // shrink, not the input cardinality passed through
      assert(est < BigInt(n) && est > BigInt(0),
        s"expected 0 < estimate < $n, got $est")
    }
  }

  test("statistics flip the broadcast decision for a managed dimension") {
    // the dim is tiny; with catalog stats present the planner must pick a
    // BroadcastHashJoin with the dim on the build side, no hint given
    val dim = "cbo_nation"
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    Tables.load(spark, dir, "nation").write.format("parquet").saveAsTable(dim)
    spark.sql(s"ANALYZE TABLE $dim COMPUTE STATISTICS")
    withCbo {
      val plan = Tables.load(spark, dir, "customer")
        .join(spark.table(dim), col("c_nationkey") === col("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a stats-driven broadcast join, got:\n${plan.take(600)}")
    }
  }
}
