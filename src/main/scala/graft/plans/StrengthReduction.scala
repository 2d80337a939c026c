package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer strength reduction: `pow(x, 2.0)` → `x * x`.
  *
  * `Pow` lowers to `java.lang.Math.pow` — a libm call Spark cannot
  * vectorize or constant-fold through; the multiply stays in generated
  * code. Numerically safe for exponent 2: `x * x` rounds the exact
  * product once, and `Math.pow` is within 1 ulp of that (the JLS allows
  * it 1 ulp of error — only StrictMath is reproducible), so the rewrite
  * can shift an unrounded result by at most 1 ulp; the query surface's
  * output rounding absorbs it.
  * Registered via [[GraftExtensions]] (injectOptimizerRule) — the
  * rule-injection seam custom engines use for domain rewrites; scoped
  * deliberately tiny per SURVEY §7.4's built-ins-first verdict.
  */
object StrengthReduction extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // deterministic guard: duplicating a non-deterministic x (rand())
      // would evaluate it twice — rand_a * rand_b, not rand^2
      case Pow(x, Literal(2.0, DoubleType)) if x.deterministic => Multiply(x, x)
    }
}
