package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the stock per-key top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W)).filter($"rn" <= k).select(<no rn>) }}}
  *
  * into the [[TopKPerKey]] logical operator, so ANY query written in the
  * universal window formulation silently gets the two-phase bounded-heap
  * plan (map-side partial → exchange of ≤ keys·k rows per partition →
  * final) instead of a full per-key sort of every group. This is the point
  * of extending Catalyst with a RULE rather than only an operator: users
  * keep writing the idiom they know, the planner supplies the 100× plan.
  *
  * The rewrite fires only when provably safe:
  *  - the window computes exactly ONE expression: `row_number()` over a
  *    non-empty partition/order spec (rank()/dense_rank() keep ties and
  *    are NOT equivalent to a k-bounded heap);
  *  - the filter is the single predicate `rn <= k` / `rn < k` / `rn = 1`
  *    with a literal bound;
  *  - a Project immediately above drops the rank column (nothing else can
  *    reference it — TopKPerKey does not produce it).
  *
  * Tie semantics: when the window order is not total, `row_number` assigns
  * boundary ties arbitrarily; the heap keeps an equally-arbitrary legal
  * subset, so the rewrite preserves the query's (already nondeterministic)
  * semantics. Engine-declared queries always carry a unique tie-break,
  * making the output exact — and oracle-checkable (q_topk_rewrite).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** rn-bound forms: rn <= k, rn < k, k >= rn, rn = 1. Returns k. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def rowNumberAlias(wes: Seq[NamedExpression]): Option[Alias] = wes match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
    case _ => None
  }

  /** Spark's own InferWindowGroupLimit (3.5+) runs in the main optimizer
    * batch and will already have inserted a WindowGroupLimit below the
    * Window — a SORT-based group limit (partial sort → exchange → final
    * sort). The heap operator subsumes it: same k, same keys/order, no
    * sorts — so the rewrite strips it rather than stacking both. */
  private def stripGroupLimit(child: LogicalPlan, partitionSpec: Seq[Expression],
                              orderSpec: Seq[Any], k: Int): LogicalPlan =
    child match {
      case WindowGroupLimit(p, o, _, limit, inner)
          if p == partitionSpec && o == orderSpec && limit >= k => inner
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(wes, partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      (for {
        a <- rowNumberAlias(wes)
        k <- bound(cond, a.toAttribute)
        if k > 0 &&
          projectList.forall(_.references.subsetOf(child.outputSet))
      } yield Project(projectList,
        TopKPerKey(partitionSpec, orderSpec, k,
          stripGroupLimit(child, partitionSpec, orderSpec, k)))).getOrElse(p)
  }
}
