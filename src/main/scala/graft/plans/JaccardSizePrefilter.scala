package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.IntersectCountSorted

/** Optimizer rule: size-compatibility pre-filtering for Jaccard thresholds.
  *
  * A filter of shape
  * {{{ graft_intersect_count(a, b) / (size(a) + size(b) - I) >= t }}}
  * pays an O(|a|+|b|) merge loop per candidate pair. But J >= t implies
  * min(|a|,|b|) / max(|a|,|b|) >= t (since I <= min and the denominator is
  * >= max), so `size(a) >= t*size(b) AND size(b) >= t*size(a)` is an EXACT
  * pre-condition — no false negatives. This rule injects those cheap bounds
  * as the left conjuncts of the filter, short-circuiting the merge-count on
  * size-incompatible pairs (the dominant case in all-pairs dedup, where most
  * pairs differ wildly in length).
  *
  * The q26 pipeline applies this bound manually inside its join condition;
  * the rule generalizes it to any user query that states only the Jaccard
  * predicate. Registered through `GraftExtensions.injectOptimizerRule` and
  * `GraftFunctions.register` (experimental.extraOptimizations); idempotent
  * under the optimizer's fixed-point batches (re-runs find the bounds
  * already present and change nothing).
  */
object JaccardSizePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def intersectArgs(e: Expression): Option[(Expression, Expression)] =
    e.collectFirst { case ic: IntersectCountSorted => (ic.left, ic.right) }

  /** The denominator must combine size(a) and size(b) of the SAME arrays the
    * intersect count runs over — otherwise the bound is unsound.
    */
  private def denominatorMatches(den: Expression, a: Expression, b: Expression): Boolean = {
    val sized = den.collect { case s: Size => s.child }
    sized.exists(_.semanticEquals(a)) && sized.exists(_.semanticEquals(b))
  }

  private def bounds(cond: Expression): Seq[Expression] =
    cond.collect {
      case GreaterThanOrEqual(div: Divide, Literal(t: Double, DoubleType))
          if t > 0.0 && t <= 1.0 =>
        intersectArgs(div.left).filter { case (a, b) =>
          denominatorMatches(div.right, a, b)
        }.toSeq.flatMap { case (a, b) =>
          val sa = Cast(Size(a), DoubleType)
          val sb = Cast(Size(b), DoubleType)
          // two separate conjuncts so the idempotency check below can match
          // them against the split condition one-by-one
          Seq(
            GreaterThanOrEqual(sa, Multiply(Literal(t), sb)),
            GreaterThanOrEqual(sb, Multiply(Literal(t), sa)))
        }
    }.flatten

  private def augment(cond: Expression): Option[Expression] = {
    val existing = splitConjunctivePredicates(cond)
    val fresh = bounds(cond).filterNot(b => existing.exists(_.semanticEquals(b)))
    if (fresh.isEmpty) None else Some(And(fresh.reduce(And), cond))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // by the time user rules run, Catalyst has usually pushed the predicate
    // into the join condition — handle both homes
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      augment(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
