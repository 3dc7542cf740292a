package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.functions.JaroWinkler

/** Optimizer rule: guard `jaro_winkler(a, b) >= τ` predicates (τ > 0.8)
  * with the cheap length-ratio lower bound
  * `least(len(a), len(b)) >= (5τ − 4 − ε) · greatest(len(a), len(b))`.
  *
  * The bound: Jaro counts m ≤ min(l1, l2) matches, so
  * jaro ≤ (m/l1 + m/l2 + 1)/3 ≤ (1 + min/max + 1)/3, and the Winkler
  * boost is capped by jw ≤ 0.6·jaro + 0.4 (prefix ≤ 4, weight 0.1).
  * Chaining: jw ≥ τ forces min/max ≥ 5τ − 4 — for τ ≤ 0.8 the bound is
  * vacuous and the rule leaves the predicate alone. The ε = 1e-6 slack
  * absorbs double rounding in the constant (and the `round(jw, 6) ≥ τ`
  * form, which implies raw jw ≥ τ − 5e-7): the guard can only be MORE
  * permissive than exact, never dropping a qualifying pair.
  *
  * On a blocked fuzzy join most candidates fail the ratio, skipping the
  * O(|a|·|b|) match-window scan entirely — the same shape as
  * [[LevenshteinPrefilter]], injected alongside it via
  * [[graft.GraftExtensions]]. Idempotent: an existing guard for the
  * same (a, b) is detected and not re-added.
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] {

  private def ratio(tau: Double): Double = 5.0 * tau - 4.0 - 1e-6

  private def bandGuard(a: Expression, b: Expression, tau: Double): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Length(a), Length(b))), DoubleType),
      Multiply(Literal(ratio(tau), DoubleType),
               Cast(Greatest(Seq(Length(a), Length(b))), DoubleType)))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Extract (a, b, τ) from `jw >= τ`, `τ <= jw`, or the round-6 forms. */
  private def jwThreshold(e: Expression): Option[(Expression, Expression, Double)] = {
    def unwrap(x: Expression): Option[(Expression, Expression)] = x match {
      case JaroWinkler(a, b) => Some((a, b))
      case Round(JaroWinkler(a, b), Literal(_, IntegerType), _) => Some((a, b))
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(x, Literal(t: Double, DoubleType)) =>
        unwrap(x).map { case (a, b) => (a, b, t) }
      case LessThanOrEqual(Literal(t: Double, DoubleType), x) =>
        unwrap(x).map { case (a, b) => (a, b, t) }
      case _ => None
    }
  }

  private def hasGuard(all: Seq[Expression], a: Expression, b: Expression): Boolean =
    all.exists {
      case GreaterThanOrEqual(Cast(Least(Seq(Length(x), Length(y))), DoubleType, _, _), _) =>
        (x.semanticEquals(a) && y.semanticEquals(b)) ||
          (x.semanticEquals(b) && y.semanticEquals(a))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val parts = conjuncts(cond)
      val rewritten = parts.flatMap { part =>
        jwThreshold(part) match {
          case Some((a, b, tau)) if tau > 0.8 && !hasGuard(parts, a, b) =>
            Seq(bandGuard(a, b, tau), part)
          case _ => Seq(part)
        }
      }
      if (rewritten.length == parts.length) f
      else Filter(rewritten.reduceLeft(And), child)
  }
}
