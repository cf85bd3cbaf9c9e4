package graft.plans

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * top-ks), which is exactly what makes the partial pass lossless.
  *
  * MEMORY SAFETY: the hash-of-heaps state is O(distinct keys · k) per
  * partition, which for a near-unique partition key approaches the whole
  * partition pinned in heap — exactly the case where Spark's sort-based
  * WindowGroupLimit would have spilled. Both passes therefore carry a
  * retained-row budget (`spark.graft.topk.rowBudget`, rows per partition):
  *  - the PARTIAL pass past budget stops filtering and passes remaining
  *    rows through untouched (its contract is only "a superset of the
  *    answer", so pass-through is trivially lossless);
  *  - the FINAL pass past budget hands everything retained plus the rest
  *    of the partition to an external SPILLING sort (key, then order) and
  *    streams the first k of each contiguous key group — the plan Spark
  *    itself would have chosen, arrived at lazily only when the heap state
  *    actually grows too big. Degrade requires the keys to be orderable
  *    (all SQL types the WindowTopKRewrite idiom sees are); unorderable
  *    keys keep the unbounded heap path, documented here.
  */
/** @param distinct DISTINCT top-k: rows that compare EQUAL under `order`
  *   within a key group count once — `TopKPerKey(distinct=true)` over a
  *   multiset ≡ `TopKPerKey` over `child.distinct()`, PROVIDED the order
  *   is a total order on the row's payload (true for every caller: the
  *   engine's contract already demands unique tie-breaks). The point is
  *   the PLAN: dedup happens inside the bounded per-key heaps of the
  *   map-side partial pass, so the exchange carries ≤ partitions·keys·k
  *   rows — where a separate `.distinct()` upstream shuffles the ENTIRE
  *   multiset (|E|·k rows per round in the KMV sketch chain, the g_anf
  *   family's measured 1.25 GB/task memory cliff at sf1) before the heap
  *   ever sees a row. */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan, distinct: Boolean = false)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, distinct) =>
      val budget = SQLConf.get.getConfString(
        "spark.graft.topk.rowBudget", (1 << 20).toString).toLong
      // final (clustered) over partial (map-side); EnsureRequirements
      // inserts the exchange between them, sized by the partial's output
      TopKPerKeyExec(keys, order, k, budget, distinct,
        TopKPerKeyPartialExec(keys, order, k, budget, distinct,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The shared per-partition bounded-heap pass. */
private[plans] object TopKHeaps {

  /** Runs the heap pass until input is exhausted or `budget` retained rows
    * are held. Returns (withinBudget, rows): when `withinBudget`, `rows`
    * is the exact per-key top-k of the input; otherwise it is everything
    * retained so far concatenated with the untouched remainder — a correct
    * superset (each dropped row lost to k better same-key rows that are
    * still present), which the caller degrades on. */
  def run(rows: Iterator[InternalRow], childOutput: Seq[Attribute],
          keyExprs: Seq[Expression], sortOrder: Seq[SortOrder],
          limit: Int, budget: Long,
          distinct: Boolean = false): (Boolean, Iterator[InternalRow]) = {
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    // max-heap by sort order: the worst retained row sits on top
    val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
    implicit val heapOrd: Ordering[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b)
    // NB float keys are grouped by raw bytes (-0.0 vs 0.0 differ) —
    // normalize float key columns upstream if SQL key equality is needed
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
    var retained = 0L
    while (rows.hasNext && retained <= budget) {
      val row = rows.next()
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
      // distinct mode: a row comparing equal to a retained same-key row is
      // a duplicate and counts once. O(k) scan per insert — k is small by
      // contract, and this is exactly the work the avoided corpus-sized
      // `.distinct()` exchange was doing with a corpus-sized hash table.
      def isDup: Boolean = distinct && heap.exists(ordering.compare(u, _) == 0)
      if (heap.size < limit) {
        if (!isDup) { heap.enqueue(u.copy()); retained += 1 }
      } else if (ordering.compare(u, heap.head) < 0) {
        if (!isDup) { heap.dequeue(); heap.enqueue(u.copy()) }
      }
    }
    val kept = heaps.valuesIterator.flatMap(_.iterator)
    if (retained <= budget) (true, kept) else (false, kept ++ rows)
  }
}

/** Map-side partial: per-partition per-key heaps over whatever distribution
  * the child happens to have. Output is a superset-filter of the final
  * answer (≤ max(keys·k, budget) rows per partition), never wrong rows;
  * past the row budget it degrades to pass-through (still a superset). */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, budget: Long, distinct: Boolean,
                                 child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (keyExprs, sortOrder, limit, rowBudget, dd) =
      (keys, order, k, budget, distinct)
    child.execute().mapPartitions { it =>
      TopKHeaps.run(it, childOutput, keyExprs, sortOrder, limit, rowBudget, dd)._2
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          budget: Long, distinct: Boolean,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Ask the planner to cluster input by key — Spark inserts the exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (keyExprs, sortOrder, limit, rowBudget, dd) =
      (keys, order, k, budget, distinct)
    // unorderable keys (no SQL ordering exists) cannot take the sort
    // degrade; give them an unbounded budget and the documented heap path
    val canDegrade = keyExprs.forall(e => RowOrdering.isOrderable(e.dataType))
    val effBudget = if (canDegrade) rowBudget else Long.MaxValue
    child.execute().mapPartitions { it =>
      val (within, rows) =
        TopKHeaps.run(it, childOutput, keyExprs, sortOrder, limit, effBudget, dd)
      if (within) rows
      else sortedGroupLimit(rows, childOutput, keyExprs, sortOrder, limit, dd)
    }
  }

  /** Exact fallback: external (spilling) sort by (key, order), then stream
    * the first k rows of each contiguous key group — O(k) live state. */
  private def sortedGroupLimit(rows: Iterator[InternalRow],
                               childOutput: Seq[Attribute],
                               keyExprs: Seq[Expression],
                               sortOrder: Seq[SortOrder],
                               limit: Int,
                               distinct: Boolean): Iterator[InternalRow] = {
    val fullOrder =
      keyExprs.map(e => SortOrder(e, Ascending)) ++ sortOrder
    val schema = DataTypeUtils.fromAttributes(childOutput)
    val ordering = new LazilyGeneratedOrdering(fullOrder, childOutput)
    // constant prefix: every comparison falls through to the full ordering.
    // Costs the radix fast-path, keeps the spill machinery — the budget
    // breach already told us spilling, not sort speed, is the concern.
    val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
      private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
      override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
        p.value = 0L; p.isNull = false; p
      }
    }
    val sorter = UnsafeExternalRowSorter.create(
      schema, ordering, PrefixComparators.LONG, prefixComputer,
      4L * 1024 * 1024, /* canUseRadixSort = */ false)
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
    val sorted = sorter.sort(rows.map(_.asInstanceOf[UnsafeRow]))
    val keyProj = UnsafeProjection.create(keyExprs, childOutput)
    var curKey: UnsafeRow = null
    var seen = 0
    // distinct mode: after the (key, order) sort duplicates are ADJACENT —
    // a row comparing equal to the previous same-key row counts zero
    var prev: UnsafeRow = null
    sorted.filter { row =>
      val key = keyProj(row)
      val newKey = curKey == null || key != curKey
      if (newKey) { curKey = key.copy(); seen = 0; prev = null }
      val dup = distinct && prev != null &&
        ordering.compare(row, prev) == 0
      if (!dup) seen += 1
      prev = row.asInstanceOf[UnsafeRow].copy()
      !dup && seen <= limit
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
