package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive interval-join predicate into the
  * binned equi-join of q30 — the range-join optimization Spark lacks
  * (the naive form plans a nested-loop join, or an equi-join whose
  * per-key group degenerates to O(rows²) range filtering).
  *
  * Matched shape (after normalization by the analyzer):
  *
  *   a JOIN b ON ... AND b.x >= a.x AND b.x < a.x + W
  *
  * with `x` LongType attributes (epoch micros in this engine) and `W`
  * a positive literal. The rewrite adds a bin equi-key on both sides —
  * probe `a` explodes to bins {x div W, x div W + 1}, build `b`
  * projects bin = x div W — and keeps every original conjunct, so
  * semantics are unchanged while the planner now sees an equi-join.
  * Each qualifying pair still matches exactly once (the build row has
  * ONE bin; the probe's two bins are distinct).
  *
  * Deliberately narrow: inner joins, attribute-vs-attribute bounds,
  * literal width, non-negative domains (integral division truncates
  * toward zero, so negative keys would bin wrong — epoch micros are
  * safe). Anything else is left untouched.
  *
  * Install session-wide via `spark.experimental.extraOptimizations`
  * (what `PlanRules.install` and the spec do) or at startup with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private case class Range(a: Attribute, b: Attribute, width: Long)

  /** b.x >= a.x (either written direction). */
  private def lowerBound(e: Expression): Option[(Attribute, Attribute)] =
    e match {
      case GreaterThanOrEqual(b: Attribute, a: Attribute) => Some((a, b))
      case LessThanOrEqual(a: Attribute, b: Attribute) => Some((a, b))
      case _ => None
    }

  /** b.x < a.x + W (either written direction). */
  private def upperBound(e: Expression): Option[(Attribute, Attribute, Long)] =
    e match {
      case LessThan(b: Attribute, Add(a: Attribute, Literal(w: Long, LongType), _)) =>
        Some((a, b, w))
      case GreaterThan(Add(a: Attribute, Literal(w: Long, LongType), _), b: Attribute) =>
        Some((a, b, w))
      case _ => None
    }

  private def findRange(conjuncts: Seq[Expression],
                        left: LogicalPlan, right: LogicalPlan): Option[Range] = {
    val lowers = conjuncts.flatMap(lowerBound)
    val uppers = conjuncts.flatMap(upperBound)
    (for {
      (la, lb) <- lowers
      (ua, ub, w) <- uppers
      if w > 0 && la.semanticEquals(ua) && lb.semanticEquals(ub)
      if la.dataType == LongType && lb.dataType == LongType
      if left.outputSet.contains(la) && right.outputSet.contains(lb)
    } yield Range(la, lb, w)).headOption
  }

  private val BinName = "graft_range_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // the bin attribute doubles as the "already rewritten" marker —
        // the optimizer batch runs to a fixed point and the rewritten
        // join still carries the original range conjuncts
        if j.resolved &&
          !left.output.exists(_.name == BinName) &&
          findRange(
            splitConjunctivePredicates(cond), left, right).isDefined =>
      val Range(a, b, w) = findRange(
        splitConjunctivePredicates(cond), left, right).get
      val width = Literal(w, LongType)
      // probe side: explode to the two bins a window can span
      val aBin = IntegralDivide(a, width)
      val binAttr = AttributeReference(BinName, LongType)()
      val probe = Generate(
        Explode(CreateArray(Seq(aBin, Add(aBin, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binAttr), child = left)
      // build side: one bin per row
      val bBinAlias = Alias(IntegralDivide(b, width), "graft_range_bin_b")()
      val build = Project(right.output :+ bBinAlias, right)
      val newCond = And(EqualTo(binAttr, bBinAlias.toAttribute), cond)
      // restore the original output (drop the bin plumbing)
      Project(j.output, Join(probe, build, Inner, Some(newCond), hint))
  }
}

/** Convenience session-level install (idempotent). */
object PlanRules {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRewrite
  }
}

/** `spark.sql.extensions` entry point for cluster deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
}
