package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic simplification Catalyst lacks: `round(round(e, p), q)` with
  * `0 <= p <= q` is exactly `round(e, p)` — a value already rounded to p
  * decimal places is a fixed point of rounding at any finer-or-equal
  * scale q (for doubles, the binary representative of a p-decimal value
  * sits within half an ulp of it, far inside the q-decimal rounding
  * cell). Oracle-parity queries produce this shape naturally when a
  * rounded intermediate feeds a rounded output column; the rewrite drops
  * the outer (dead) round, one fewer BigDecimal round-trip per row
  * inside whole-stage codegen.
  *
  * Registered through [[graft.GraftExtensions]]'s `injectOptimizerRule` —
  * the extension-point mechanics a library ships custom Catalyst logic
  * with (SURVEY.md §2.10/§4.2).
  *
  * Deliberately conservative: literal non-negative scales only, and the
  * inner/outer data types must MATCH — this excludes DecimalType, where
  * removing the outer round would change the result scale (and thus the
  * schema), while double/float/integral rounds are type-stable.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ Round(inner @ Round(_, Literal(ps: Int, _), _),
          Literal(qs: Int, _), _)
          if ps >= 0 && qs >= ps && inner.dataType == outer.dataType =>
        inner
    }
}
