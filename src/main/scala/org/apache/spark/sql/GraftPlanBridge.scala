package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDF, Dataset => ClassicDataset, SparkSession => ClassicSession}

import graft.plans.{TopKPerKey, TopKPerKeyStrategy}

/** Bridge into Spark's private[sql] Dataset factory so graft's custom
  * logical operators can be exposed as ordinary DataFrames — the standard
  * pattern for pre-extension-API operator libraries (same namespace trick
  * the Spark ecosystem connectors use). Keep every private-API touch here.
  */
object GraftPlanBridge {

  private def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  private def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDF].logicalPlan

  /** Column over a raw catalyst Expression (the classic-session Column
    * factory) — lets operator code use custom expressions without a
    * function-registry round-trip. */
  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The catalyst Expression behind a Column (classic sessions). */
  def columnExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Idempotently install the TopKPerKey strategy AND the window-top-k
    * optimizer rewrite into a session built without GraftExtensions (the
    * extensions path injects both at session build). After this, the stock
    * `row_number().over(W) <= k` idiom in ANY query on the session plans as
    * the two-phase bounded-heap operator. */
  def installTopK(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(graft.plans.WindowTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.WindowTopKRewrite
  }

  /** Per-key top-k via the custom TopKPerKey operator (graft.plans). Order
    * entries are (columnName, ascending); include a unique tie-break column
    * for deterministic output. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 order: Seq[(String, Boolean)], k: Int,
                 distinct: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty, "at least one key column is required")
    require(order.nonEmpty, "at least one order column is required")
    val spark = df.sparkSession
    installTopK(spark)
    // .quoted: names are literal column names, never nested-field paths
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (asc) Ascending else Descending)
    }
    ofRows(spark, TopKPerKey(keyCols.map(UnresolvedAttribute.quoted), sortOrders, k,
      logicalPlan(df), distinct))
  }

  /** DISTINCT per-key top-k: `topKPerKey(child.distinct(), …)` semantics
    * with the dedup folded INTO the bounded heaps, so no corpus-sized
    * distinct exchange precedes the operator (see TopKPerKey scaladoc).
    * Requires `order` to be a total order on the row payload. */
  def topKPerKeyDistinct(df: DataFrame, keyCols: Seq[String],
                         order: Seq[(String, Boolean)], k: Int): DataFrame =
    topKPerKey(df, keyCols, order, k, distinct = true)
}
