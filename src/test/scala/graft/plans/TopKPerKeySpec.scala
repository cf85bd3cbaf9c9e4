package graft.plans

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The custom TopKPerKey operator must return exactly the rows of the
  * window row_number formulation (given a total order) while planning as
  * the custom exec node with a key-clustered exchange instead of a full
  * per-key sort. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("equals the window row_number formulation on a total order") {
    val orders = Tables.load(spark, dir, "orders")
    val custom = GraftPlanBridge.topKPerKey(orders,
      Seq("o_custkey"),
      Seq("o_orderdate" -> true, "o_orderkey" -> true), k = 3)
      .select("o_custkey", "o_orderkey")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
    assert(custom.count() == viaWindow.count())
    assert(custom.except(viaWindow).count() == 0 && viaWindow.except(custom).count() == 0)
  }

  test("plans as TopKPerKeyExec with a clustered exchange, no sort") {
    val orders = Tables.load(spark, dir, "orders")
    val custom = GraftPlanBridge.topKPerKey(orders,
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(500))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(500))
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Sort "),
      "bounded heaps must replace the per-key sort:\n" + plan.take(800))
    assert(custom.count() > 0)
  }

  test("two-phase: a map-side partial heap runs BELOW the exchange") {
    val orders = Tables.load(spark, dir, "orders")
    val custom = GraftPlanBridge.topKPerKey(orders,
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
    val plan = custom.queryExecution.executedPlan
    // exactly one partial and one final, with the exchange between them —
    // the aggregation-style shape that caps the shuffle at keys·k per
    // partition instead of every input row
    val s = plan.toString
    assert(s.contains("TopKPerKeyPartial"), s.take(800))
    val partialIdx = s.indexOf("TopKPerKeyPartial")
    val exchangeIdx = s.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "partial must sit below the exchange:\n" + s.take(800))
    // and the partial pass must not change results (monoid property):
    // compared against the window formulation like the equality test
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = custom.select("o_custkey", "o_orderkey", "o_totalprice")
    assert(got.except(viaWindow).count() == 0 && viaWindow.except(got).count() == 0)
  }

  test("row-budget breach degrades to the spilling sort, exact results") {
    // near-unique partition key (o_orderkey ≈ one row per key) is exactly
    // the heap-state blow-up the budget exists for; an 8-row budget forces
    // BOTH degrades (partial → pass-through, final → external sort) on
    // every partition, and the answer must not change
    val orders = Tables.load(spark, dir, "orders")
    spark.conf.set("spark.graft.topk.rowBudget", "8")
    try {
      val custom = GraftPlanBridge.topKPerKey(orders,
        Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
        .select("o_custkey", "o_orderkey")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val viaWindow = orders
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey")
      assert(custom.count() == viaWindow.count())
      assert(custom.except(viaWindow).count() == 0 &&
        viaWindow.except(custom).count() == 0)
      // unique key, k=1: every row is its own group — the degenerate case
      // where heap state equals the partition
      val perOrder = GraftPlanBridge.topKPerKey(orders,
        Seq("o_orderkey"), Seq("o_totalprice" -> true), k = 1)
      assert(perOrder.count() == orders.count())
    } finally spark.conf.unset("spark.graft.topk.rowBudget")
  }

  test("descending order returns the top, not the bottom") {
    val orders = Tables.load(spark, dir, "orders")
    val top1 = GraftPlanBridge.topKPerKey(orders,
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 1)
    val expected = orders.groupBy("o_custkey").agg(max("o_totalprice").as("m"))
    val joined = top1.join(expected, "o_custkey")
      .filter(col("o_totalprice") =!= col("m"))
    assert(joined.count() == 0)
  }
}
