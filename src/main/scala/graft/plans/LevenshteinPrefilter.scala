package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: guard `levenshtein(a, b) <= k` predicates with the
  * cheap length-band lower bound `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is bounded below by the length difference, so the guard
  * never changes results — it short-circuits the O(|a|·|b|) dynamic
  * program for pairs that cannot qualify. On a blocked fuzzy self-join
  * most candidate pairs fail the band, so the rewrite removes the
  * dominant cost of the join without touching user code — exactly the
  * kind of algebraic work Catalyst should do, injected via
  * `SparkSessionExtensions.injectOptimizerRule` (see
  * [[graft.GraftExtensions]]).
  *
  * The rewrite is idempotent: a conjunction already containing the guard
  * for the same (a, b, k) is left alone, so repeated optimizer passes
  * reach a fixpoint.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def bandGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** Conjuncts of a nested And. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def hasGuard(all: Seq[Expression], a: Expression, b: Expression,
                       k: Expression): Boolean =
    all.exists {
      case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), kk) =>
        kk.semanticEquals(k) &&
          ((x.semanticEquals(a) && y.semanticEquals(b)) ||
           (x.semanticEquals(b) && y.semanticEquals(a)))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val parts = conjuncts(cond)
      val rewritten = parts.flatMap {
        case lev @ LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType))
            if !hasGuard(parts, a, b, k) =>
          Seq(bandGuard(a, b, k), lev)
        case lev @ GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None))
            if !hasGuard(parts, a, b, k) =>
          Seq(bandGuard(a, b, k), lev)
        case other => Seq(other)
      }
      if (rewritten.length == parts.length) f
      else Filter(rewritten.reduceLeft(And), child)
  }
}
