package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: the standard window-rank top-k idiom
  *
  * {{{ Project [cols w/o rk]
  *     +- Filter (rk <= K)
  *        +- Window [row_number() OVER (PARTITION BY p ORDER BY o) rk]  }}}
  *
  * becomes [[TopKPerKeyNode]] — users keep writing the idiomatic
  * DataFrame/SQL form and get the heap plan (partial → one exchange →
  * final, zero sorts) for free. Injected by
  * [[GraftExtensions]] (`spark.sql.extensions`) alongside the planner
  * strategy; deliberately NOT self-registered by the `TopK.perKey`
  * API, so a session only opts into plan rewriting explicitly.
  *
  * Fires only when provably equivalent:
  *  - the Window computes EXACTLY ONE function, a `row_number()`
  *    (`rank`/`dense_rank` admit >k rows on ties — different
  *    semantics);
  *  - the filter is exactly `rk <= lit` / `rk < lit` on that rank
  *    (conjunctions are left alone: pushing the other predicate
  *    below the operator would change which rows rank);
  *  - the rank column is consumed by NOTHING above (the Project
  *    neither emits nor references it), so dropping the Window loses
  *    no output;
  *  - the partition spec is non-empty (a global top-k is
  *    TakeOrdered's job, and ClusteredDistribution needs keys).
  *
  * Tie caveat (same as the window form): with a non-total order, which
  * tied row ranks k-th is execution-dependent in BOTH forms — the
  * rewrite preserves the semantics class, not a particular tie pick.
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rk: Alias): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(v))
      if a.exprId == rk.exprId => Some(v)
    case LessThan(a: AttributeReference, IntegerLiteral(v))
      if a.exprId == rk.exprId => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case rk @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(part, ord, _)), _) if part.nonEmpty =>
          rankLimit(cond, rk) match {
            case Some(k) if k > 0 &&
                !projectList.exists(_.references.contains(rk.toAttribute)) &&
                projectList.forall(_.references.subsetOf(w.child.outputSet)) =>
              // if InsertWindowGroupLimit already ran (the rewrite is
              // in a post-hoc batch), its rank-prune below the Window
              // is subsumed by the heap operator — strip it
              val base = w.child match {
                case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
                case c => c
              }
              Project(projectList, TopKPerKeyNode(part, ord, k, base))
            case _ => p
          }
        case _ => p
      }
  }
}
