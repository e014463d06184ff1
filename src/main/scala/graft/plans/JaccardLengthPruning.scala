package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardSimilarity

/** Domain-specific optimizer rule (injected via
  * [[graft.GraftExtensions]], the `PhysicalExtensionNode`-style escape
  * hatch of SURVEY §2.2): a predicate `graft_jaccard(a, b) >= t` implies
  * the length constraint `t*|a| <= |b| AND t*|b| <= |a|` — J >= t bounds
  * the size ratio of the two sets. The rule conjoins that implied
  * constraint, so the cheap O(1) size comparison short-circuits the O(|a|+
  * |b|) merge-walk for length-incompatible pairs. Users writing the naive
  * verification filter get the same length pruning the hand-tuned
  * prefix-filter join (pipeline/Dedup.scala) applies explicitly.
  *
  * Semantics-preserving by construction: the added conjunct is implied by
  * the original predicate, so it can only skip work, never change the
  * result (asserted by equivalence in PlansSpec). Filters that already
  * mention `size(...)` are left untouched — that both keeps the rule
  * idempotent across optimizer fixpoint iterations and stays out of the
  * way of hand-tuned queries. */
object JaccardLengthPruning extends Rule[LogicalPlan] {

  private def lengthGuard(j: JaccardSimilarity, t: Expression): Expression = {
    val sa = Cast(Size(j.left), DoubleType)
    val sb = Cast(Size(j.right), DoubleType)
    And(LessThanOrEqual(Multiply(sa, t), sb),
      LessThanOrEqual(Multiply(sb, t), sa))
  }

  /** A guard (or a user's own hand-tuned equivalent) already exists for
    * this jaccard call iff the condition measures `size(...)` of either of
    * its argument arrays — per-expression, so an unrelated `size(toks)`
    * conjunct elsewhere in the filter doesn't suppress the rewrite. Also
    * the idempotence check: the injected guard itself contains
    * `Size(j.left)`, so fixpoint iterations of the optimizer batch don't
    * re-wrap. */
  private def hasSizeGuard(cond: Expression, j: JaccardSimilarity): Boolean =
    cond.collect { case s: Size => s.child }
      .exists(c => c.semanticEquals(j.left) || c.semanticEquals(j.right))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // transformUp: the rewrite embeds the matched node in its
      // replacement, which transformDown would descend into forever.
      val augmented = cond.transformUp {
        case geq @ GreaterThanOrEqual(j: JaccardSimilarity,
            t @ Literal(v: Double, DoubleType))
            if v > 0 && !hasSizeGuard(cond, j) =>
          And(lengthGuard(j, t), geq)
        case leq @ LessThanOrEqual(t @ Literal(v: Double, DoubleType),
            j: JaccardSimilarity) if v > 0 && !hasSizeGuard(cond, j) =>
          And(lengthGuard(j, t), leq)
      }
      if (augmented.fastEquals(cond)) f else f.copy(condition = augmented)
  }
}
