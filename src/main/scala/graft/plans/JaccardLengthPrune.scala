package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.JaccardSorted

/** Optimizer rule: plant the IMPLIED length-ratio prefilter in front of
  * every `jaccard_sorted(a, b) >= τ` predicate — the prefix-filter lemma
  * (J(A,B) ≥ τ ⟹ τ·|B| ≤ |A| ∧ τ·|A| ≤ |B|, since |A| ≥ |A∩B| ≥ τ·|A∪B|
  * ≥ τ·|B|) enforced at the OPTIMIZER level, so every SQL user of the
  * extension function gets the cheap O(1) size gate ahead of the O(n)
  * merge-walk without writing it — the curated engine queries
  * (`LlmQueries.jaccardPairs`) hand-roll exactly this bound; the rule is
  * how uncurated ad-hoc SQL gets the same plan discipline. This is the
  * `injectOptimizerRule` third of the SparkSessionExtensions story
  * (functions and plan-audited compositions being the other two).
  *
  * Soundness over FLOAT semantics (the part a naive `size(a) >= τ*size(b)`
  * rewrite gets wrong): the query's own predicate compares the DOUBLE
  * division `fl(|∩|/|∪|)` — and often `round(·, 4)` of it — against a
  * double literal, each within ~2⁻⁵² (resp. 5·10⁻⁵) of the real ratio.
  * A guard must never drop a pair the original predicate would keep, so
  * the threshold is taken STRICTLY BELOW every such rounding: sizes are
  * compared by long cross-multiplication against
  * `thr = ⌊τ·2³²⌋ − 2¹⁹` (2¹⁹/2³² ≈ 1.2·10⁻⁴ covers the worst ulp AND
  * the round-4 half-step of 5·10⁻⁵, with orders of magnitude to spare),
  * i.e. `size(a)·2³² ≥ thr·size(b)` — exact integer arithmetic for any
  * realistic array (overflow needs 2³¹-element arrays). The prune it
  * buys is τ − 1.2·10⁻⁴ of the ideal — indistinguishable in practice.
  *
  * Idempotence (optimizer rules run to a fixed point): a predicate whose
  * enclosing condition already contains the semantically-equal guard is
  * left alone, so the second pass is a no-op instead of nesting guards
  * forever. Null semantics are preserved: the guard is null exactly when
  * an input array is null, in which case the original conjunct is null
  * too and the filter/join row was dropped already.
  */
object JaccardLengthPrune extends Rule[LogicalPlan] {

  private val Scale = 1L << 32
  private val Slack = 1L << 19

  private def sizeL(a: Expression): Expression =
    Cast(Size(a, legacySizeOfNull = false), LongType)

  private def guard(a: Expression, b: Expression, thr: Long): Expression =
    GreaterThanOrEqual(Multiply(sizeL(a), Literal(Scale)),
      Multiply(Literal(thr), sizeL(b)))

  /** The jaccard value under a `>= τ`-style comparison, unwrapping an
    * optional `round(·, d)` with d ≥ 4 (the engine's own round4 idiom —
    * its half-step 0.5·10⁻⁴ is inside the slack).
    */
  private def jaccardOf(e: Expression): Option[JaccardSorted] = e match {
    case j: JaccardSorted => Some(j)
    case Round(j: JaccardSorted, Literal(d: Int, IntegerType), _) if d >= 4 =>
      Some(j)
    case _ => None
  }

  private def threshold(t: Double): Option[Long] = {
    val thr = (t * Scale.toDouble).toLong - Slack
    if (t > 0.05 && t <= 1.0 && thr > 0) Some(thr) else None
  }

  private def rewrite(cond: Expression): Expression = {
    // `cond` is the full enclosing condition: a guard that is already
    // present (a prior fixed-point iteration planted it) suppresses the
    // rewrite, keeping the rule idempotent.
    def guarded(cmp: Expression, jv: Expression, t: Double): Expression =
      (jaccardOf(jv), threshold(t)) match {
        case (Some(j), Some(thr)) =>
          val ga = guard(j.left, j.right, thr)
          val gb = guard(j.right, j.left, thr)
          if (cond.exists(_.semanticEquals(ga))) cmp
          else And(And(ga, gb), cmp)
        case _ => cmp
      }
    cond.transformUp {
      case cmp @ GreaterThanOrEqual(jv, Literal(t: Double, DoubleType)) =>
        guarded(cmp, jv, t)
      case cmp @ GreaterThan(jv, Literal(t: Double, DoubleType)) =>
        guarded(cmp, jv, t)
      case cmp @ LessThanOrEqual(Literal(t: Double, DoubleType), jv) =>
        guarded(cmp, jv, t)
      case cmp @ LessThan(Literal(t: Double, DoubleType), jv) =>
        guarded(cmp, jv, t)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) if cond.exists(_.isInstanceOf[JaccardSorted]) =>
      f.copy(condition = rewrite(cond))
    case j @ Join(_, _, _, Some(cond), _)
        if cond.exists(_.isInstanceOf[JaccardSorted]) =>
      j.copy(condition = Some(rewrite(cond)))
  }
}
