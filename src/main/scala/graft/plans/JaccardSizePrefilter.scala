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

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** Accept ONLY the exact Jaccard shape `I / (size(a) + size(b) - I)` (modulo
    * numeric-widening casts, size operand order, and Catalyst's alternate
    * association `(size(a) - I) + size(b)`): the numerator must be the BARE
    * intersect count and the subtracted term the semantically-identical count
    * over the same two arrays whose sizes appear in the denominator. Anything
    * looser is unsound: for Dice similarity `2·I/(|a|+|b|)` the containment
    * checks this method replaces would still fire, and the injected size
    * bound would silently drop matching rows (|a|=4, |b|=6, I=4 has Dice 0.8
    * but fails `|a| ≥ 0.8·|b|`).
    */
  private def jaccardArgs(div: Divide): Option[(Expression, Expression)] = {
    stripCast(div.left) match {
      case num: IntersectCountSorted =>
        def sizesMatch(x: Expression, y: Expression): Boolean =
          (stripCast(x), stripCast(y)) match {
            case (sa: Size, sb: Size) =>
              (sa.child.semanticEquals(num.left) && sb.child.semanticEquals(num.right)) ||
                (sa.child.semanticEquals(num.right) && sb.child.semanticEquals(num.left))
            case _ => false
          }
        def sameCount(e: Expression): Boolean = stripCast(e) match {
          case ic: IntersectCountSorted => ic.semanticEquals(num)
          case _ => false
        }
        val matches = stripCast(div.right) match {
          // (size(a) + size(b)) - I
          case Subtract(add, icd, _) if sameCount(icd) =>
            stripCast(add) match {
              case Add(x, y, _) => sizesMatch(x, y)
              case _ => false
            }
          // (size(a) - I) + size(b)  /  size(b) + (size(a) - I)
          case Add(l, r, _) =>
            def half(sub: Expression, sz: Expression): Boolean =
              stripCast(sub) match {
                case Subtract(x, icd, _) if sameCount(icd) => sizesMatch(x, sz)
                case _ => false
              }
            half(l, r) || half(r, l)
          case _ => false
        }
        if (matches) Some((num.left, num.right)) else None
      case _ => None
    }
  }

  /** Bounds for ONE predicate that IS the Jaccard threshold — matched at
    * the top of the conjunct, never collected from inside Or/Not/CaseWhen
    * subtrees: a disjunct's bound injected as a top-level conjunct would
    * drop rows the other disjunct accepts (e.g.
    * `size(a) = 0 OR jaccard >= t`).
    */
  private def bounds(pred: Expression): Seq[Expression] = pred match {
    case GreaterThanOrEqual(div: Divide, Literal(t: Double, DoubleType))
        if t > 0.0 && t <= 1.0 =>
      jaccardArgs(div).toSeq.flatMap { case (a, b) =>
        val sa = Cast(Size(a), DoubleType)
        val sb = Cast(Size(b), DoubleType)
        // two separate conjuncts so the idempotency check below can match
        // them against the split condition one-by-one
        Seq(
          GreaterThanOrEqual(sa, Multiply(Literal(t), sb)),
          GreaterThanOrEqual(sb, Multiply(Literal(t), sa)))
      }
    case _ => Nil
  }

  private def augment(cond: Expression): Option[Expression] = {
    val existing = splitConjunctivePredicates(cond)
    val fresh = existing.flatMap(bounds)
      .filterNot(b => existing.exists(_.semanticEquals(b)))
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
