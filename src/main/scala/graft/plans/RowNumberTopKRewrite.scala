package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-n-per-group idiom
  *
  *   SELECT <cols, no rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) rn …)
  *   WHERE rn <= k
  *
  * into the [[TopKPerKey]] operator, whose partial/final heap execution
  * shuffles at most k rows per key per partition instead of sorting and
  * shuffling everything (see TopKPerKey.scala). Users keep writing the
  * window form; the planner takes the cheap path.
  *
  * Guards (rewrite only when provably equivalent):
  *   - a single row_number window expression, its attribute used ONLY
  *     in the `rn <= k` / `rn = 1` / `rn < k` filter and absent from
  *     the projection above;
  *   - non-empty partition and order specs (a global window would put
  *     every row on one key — the window form is equally degenerate,
  *     but we leave it alone).
  *
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def isRowNumber(e: Expression): Boolean = e match {
    case WindowExpression(_: RowNumber, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          w @ Window(Seq(alias @ Alias(we, _)), partitionSpec, orderSpec, child, _)))
        if isRowNumber(we) && partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      limitOf(cond, rn) match {
        case Some(k) if k > 0 &&
            !projectList.exists(_.references.contains(rn)) =>
          Project(projectList, TopKPerKey(k, partitionSpec, orderSpec, child))
        case _ => p
      }
  }
}
