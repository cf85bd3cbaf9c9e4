package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (the full extension ladder:
  * logical node → Strategy → physical exec, SURVEY.md §7 ladder rung (c)).
  *
  * The stock formulation — `row_number() OVER (PARTITION BY key ORDER BY
  * ord) <= k` — fully sorts every key group; at 100 TB that is a massive
  * sort for a tiny k. This operator keeps one bounded k-heap per key per
  * partition: O(n log k) with O(keys·k) state, no sort. Same rows out (set
  * semantics) when the ordering is total (callers include a tie-break
  * column, as everywhere in this engine).
  *
  * Physical shape is aggregation-style TWO-PHASE: a partial pass runs the
  * identical heap logic on the unclustered input (map side), so the
  * exchange carries at most partitions·keys·k rows instead of every input
  * row — per-key top-k is a monoid (top-k of a union = top-k of per-part
  * top-ks), which is exactly what makes the partial pass lossless. */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // final (clustered) over partial (map-side); EnsureRequirements
      // inserts the exchange between them, sized by the partial's output
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The shared per-partition bounded-heap pass. */
private[plans] object TopKHeaps {
  def run(rows: Iterator[InternalRow], childOutput: Seq[Attribute],
          keyExprs: Seq[Expression], sortOrder: Seq[SortOrder],
          limit: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    // max-heap by sort order: the worst retained row sits on top
    val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
    implicit val heapOrd: Ordering[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
    // NB float keys are grouped by raw bytes (-0.0 vs 0.0 differ) —
    // normalize float key columns upstream if SQL key equality is needed
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
    rows.foreach { row =>
      val key = keyProj(row)
      // probe with the reused projection row; copy only on first insert
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[UnsafeRow]
          heaps.put(key.copy(), h)
          h
      }
      val u = row.asInstanceOf[UnsafeRow]
      if (heap.size < limit) heap.enqueue(u.copy())
      else if (ordering.compare(u, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(u.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side partial: per-partition per-key heaps over whatever distribution
  * the child happens to have. Output is a superset-filter of the final
  * answer (≤ keys·k rows per partition), never wrong rows. */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (keyExprs, sortOrder, limit) = (keys, order, k)
    child.execute().mapPartitions(
      TopKHeaps.run(_, childOutput, keyExprs, sortOrder, limit))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask the planner to cluster input by key — Spark inserts the exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (keyExprs, sortOrder, limit) = (keys, order, k)
    child.execute().mapPartitions(
      TopKHeaps.run(_, childOutput, keyExprs, sortOrder, limit))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
