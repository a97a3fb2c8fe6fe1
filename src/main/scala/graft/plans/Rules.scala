package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Upper}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Demonstrative Catalyst optimizer extension (SURVEY §4.1 records that no
  * custom rule is REQUIRED for the declared catalog — Catalyst covers it;
  * this rule exists to exercise the injectOptimizerRule extension point
  * with a provably semantics-preserving rewrite).
  *
  * Collapses idempotent nested case-normalizations: upper(upper(x)) ->
  * upper(x) (and the lower/lower analog via the same shape) — the kind of
  * no-op that survives mechanical query generation in migration tooling.
  */
object CollapseNestedUpper extends Rule[LogicalPlan] {
  private def collapse(e: Expression): Expression = e.transformUp {
    case Upper(Upper(child)) => Upper(child)
    case org.apache.spark.sql.catalyst.expressions.Lower(
           org.apache.spark.sql.catalyst.expressions.Lower(child)) =>
      org.apache.spark.sql.catalyst.expressions.Lower(child)
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => collapse(e) }
}
