package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Custom optimizer rule (the `Rule[LogicalPlan]` extension surface):
  * `fused_spread(x, x)` is identically 0.0 for every non-null x —
  * including the mid == 0 case, which [[FusedSpread]] defines as 0.0 —
  * so the whole expression folds to `if(isnull(x), null, 0.0)`.
  * Exactly null-preserving, so the rewrite is semantics-exact.
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`); the
  * spec also applies it directly to analyzed plans. A degenerate
  * self-spread appears in real queries through view composition and
  * column aliasing — the rule removes the arithmetic before codegen.
  */
object SimplifySelfSpread extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FusedSpread(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal(null, DoubleType), Literal(0.0))
    }
}
