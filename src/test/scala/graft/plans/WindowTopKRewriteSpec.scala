package graft.plans

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The window-top-k optimizer rewrite: the stock row_number idiom plans as
  * the two-phase TopKPerKey operator when (and only when) the rewrite is
  * provably safe. */
class WindowTopKRewriteSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftPlanBridge.installTopK(s)
    s
  }
  lazy val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")

  private def topkIdiom(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("row_number idiom rewrites to TopKPerKey and drops the window sort") {
    val df = topkIdiom(2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(600))
    assert(!plan.contains("Window"), "window must be rewritten away:\n" + plan.take(600))
    // identical rows to the un-rewritten formulation: keeping rn in the
    // output blocks the rewrite (a .drop would collapse into an eligible
    // Project), so the control runs the stock window plan; rn is discarded
    // on the driver
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val control = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    assert(control.queryExecution.executedPlan.toString.contains("Window"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(df.collect().map(key).toSet == control.collect().map(key).toSet)
  }

  test("rn = 1 (argmax idiom) rewrites with k = 1") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val expected = orders.groupBy("o_custkey").count().count()
    assert(df.count() == expected) // exactly one row per key
  }

  test("NOT rewritten: rank() keeps ties and must stay a window") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val df = orders.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey")
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }

  test("NOT rewritten: the rank column is consumed downstream") {
    val df = topkIdiom(3).queryExecution // control: this one rewrites
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val keepsRn = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn")
    assert(!keepsRn.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.executedPlan.toString.contains("TopKPerKey"))
  }

  test("NOT rewritten: non-literal bound") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("o_custkey"))
      .select("o_custkey", "o_orderkey")
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
