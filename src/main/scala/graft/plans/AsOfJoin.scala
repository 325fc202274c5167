package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join (SURVEY.md §2.3 "not in reference; engine-level"):
  * for every left row, attach the right row with equal key and the
  * greatest right time ≤ the left time; left rows with no such right row
  * are dropped (inner as-of — DuckDB `ASOF JOIN` semantics, which the
  * oracle uses).
  *
  * Spark has no built-in as-of join; this is the whole-operator custom
  * node of the preference ladder (logical node + planner strategy +
  * physical exec), planned by [[graft.GraftExtensions]] via
  * injectPlannerStrategy into [[graft.plans.AsOfJoinExec]].
  *
  * Times must be LongType (the engine's epoch-micros convention).
  * Right-side (key, time) pairs must be unique — pre-aggregate snapshots
  * upstream — otherwise the winner among ties is partition-order
  * dependent.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}
