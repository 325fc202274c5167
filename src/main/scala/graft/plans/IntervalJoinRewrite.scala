package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (SURVEY.md §2.10 ladder: custom `Rule[LogicalPlan]`)
  * rewriting interval-OVERLAP joins — the one join shape Spark can only
  * plan as a nested loop / cartesian, because the predicate
  *
  *   a.s <= b.e AND b.s <= a.e          (both columns LongType)
  *
  * has no equi-conjunct. The rewrite is the q104 temporal-binning plan,
  * derived automatically: both sides explode into the bucket starts
  * covering their interval (`sequence(s − pmod(s,B), e − pmod(e,B), B)`
  * — fan-out bounded by span/B), the join gains the equi-conjunct
  * `bk_l = bk_r`, and EXACTLY-ONCE semantics come from the canonical-
  * bucket predicate `bk_l = greatest(a.s, b.s) − pmod(greatest(..), B)`:
  * an overlapping pair's overlap START lies inside both intervals, so
  * that one bucket appears in both explodes and no other bucket passes
  * — row multiplicity is preserved without any Distinct (duplicate
  * input rows keep their duplicate matches). Non-overlapping pairs are
  * still removed by the original inequality conjuncts, which the rule
  * keeps. NULL bounds explode to zero rows — exactly the rows the
  * original predicate already dropped.
  *
  * Opt-in: fires only when `spark.graft.intervalJoin.bucketWidth` is a
  * positive long, only on INNER joins whose overlap bounds are plain
  * LongType attribute references (one interval per side), and never on
  * its own output (the `graft_bk` columns mark a rewritten join).
  * Registered through [[graft.GraftExtensions]] (injectOptimizerRule)
  * or `spark.experimental.extraOptimizations`.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.intervalJoin.bucketWidth"
  private val BkName = "graft_bk"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(ConfKey, "")
    if (width.isEmpty || width.toLong <= 0) return plan
    val b = width.toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name == BkName) =>
        rewrite(j, left, right, cond, hint, b).getOrElse(j)
    }
  }

  /** A conjunct `x <= y` with x a LongType attribute of `from` and y a
    * LongType attribute of `to`.
    */
  private def sidedLeq(e: Expression, from: LogicalPlan, to: LogicalPlan)
      : Option[(AttributeReference, AttributeReference)] = e match {
    case LessThanOrEqual(x: AttributeReference, y: AttributeReference)
        if x.dataType == LongType && y.dataType == LongType &&
          from.outputSet.contains(x) && to.outputSet.contains(y) =>
      Some((x, y))
    case _ => None
  }

  /** Bucket INDEX via `div` — truncating, but every bucket computation
    * uses the same monotone function, which is all exactly-once needs
    * (floor alignment is not required; negatives and even malformed
    * s > e intervals stay correct — a descending default-step sequence
    * covers the same index set).
    */
  private def bucketIdx(x: Expression, b: Long): Expression =
    IntegralDivide(x, Literal(b))

  private def explodeBuckets(child: LogicalPlan, s: Expression, e: Expression,
      b: Long): (LogicalPlan, Attribute) = {
    val bk = AttributeReference(BkName, LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: resolved only once the zone
    // is pinned, even for pure-long sequences
    val gen = Explode(new Sequence(
      bucketIdx(s, b), bucketIdx(e, b), None, Some(conf.sessionLocalTimeZone)))
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bk), child), bk)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      b: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // find (aS <= bE) and (bS <= aE): one left→right, one right→left
    val lr = conjuncts.flatMap(c => sidedLeq(c, left, right).map(c -> _))
    val rl = conjuncts.flatMap(c => sidedLeq(c, right, left).map(c -> _))
    (lr.headOption, rl.headOption) match {
      case (Some((_, (aS, bE))), Some((_, (bS, aE)))) =>
        val (lGen, bkL) = explodeBuckets(left, aS, aE, b)
        val (rGen, bkR) = explodeBuckets(right, bS, bE, b)
        val canonical = bucketIdx(Greatest(Seq(aS, bS)), b)
        val newCond = (conjuncts :+ EqualTo(bkL, bkR) :+ EqualTo(bkL, canonical))
          .reduce(And)
        Some(Project(j.output,
          Join(lGen, rGen, Inner, Some(newCond), hint)))
      case _ => None
    }
  }
}
