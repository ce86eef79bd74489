package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= t` with the free necessary
  * condition `abs(length(a) - length(b)) <= t`.
  *
  * Edit distance is bounded below by the length difference, and `length` is
  * O(1) on UTF8String while `levenshtein` is O(|a|·|b|) — so for near-dup
  * verification at scale (millions of candidate pairs, kB–MB texts) the
  * guard skips the quadratic compute for every pair whose lengths already
  * rule it out, without changing any result. This is the kind of rewrite a
  * user shouldn't have to hand-write into every query; registered through
  * `SparkSessionExtensions.injectOptimizerRule` (see GraftExtensions).
  *
  * The rule is fixpoint-safe: it skips predicates whose guard is already
  * present (`semanticEquals` over the conjuncts).
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** |len(a) − len(b)| cast to the threshold's type (no analyzer runs
    * after the optimizer, so the comparison must be built type-correct). */
  private def lenDiff(a: Expression, b: Expression, t: Expression): Expression = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    if (diff.dataType == t.dataType) diff else Cast(diff, t.dataType)
  }

  private def guardFor(cond: Expression): Option[Expression] = cond match {
    case LessThanOrEqual(Levenshtein(a, b, None), t) if guardable(a, b, t) =>
      Some(LessThanOrEqual(lenDiff(a, b, t), t))
    case LessThan(Levenshtein(a, b, None), t) if guardable(a, b, t) =>
      Some(LessThan(lenDiff(a, b, t), t))
    case GreaterThanOrEqual(t, Levenshtein(a, b, None)) if guardable(a, b, t) =>
      Some(GreaterThanOrEqual(t, lenDiff(a, b, t)))
    case GreaterThan(t, Levenshtein(a, b, None)) if guardable(a, b, t) =>
      Some(GreaterThan(t, lenDiff(a, b, t)))
    case _ => None
  }

  /** The guard re-evaluates a and b (via length): a nondeterministic
    * operand would see different values in the guard and the predicate —
    * a semantic change, not just wasted work — so both must be
    * deterministic, and the threshold cheap to evaluate twice. */
  private def guardable(a: Expression, b: Expression, t: Expression): Boolean =
    a.deterministic && b.deterministic && isCheap(t)

  /** Only guard when the threshold side is cheap to evaluate twice. */
  private def isCheap(e: Expression): Boolean = e match {
    case _: Literal => true
    case _: Attribute => true
    case _ => e.find(_.isInstanceOf[Levenshtein]).isEmpty && e.deterministic &&
      e.children.forall(isCheap)
  }

  /** Prepend missing guards to a conjunction; None when nothing to add.
    * Guards go FIRST so short-circuit evaluation skips the quadratic
    * distance for length-pruned rows. */
  private def guarded(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val guards = conjuncts.flatMap(guardFor)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    else Some(guards.foldLeft(cond)((acc, g) => And(g, acc)))
  }

  /** Filters AND join conditions: predicate pushdown routinely folds a
    * post-join `filter(levenshtein(...) <= t)` INTO the join condition
    * (the q92 linkage verify stage lands exactly there), where a
    * Filter-only rule would silently never fire. Conjoining a necessary
    * condition of an existing conjunct leaves the condition's truth
    * value unchanged, so the rewrite is legal for every join type. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      guarded(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
