package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical sort-merge as-of join: both children are hash-clustered on
  * the key and sorted by (key, time); one forward pass per partition
  * keeps the newest right row ≤ the current left time per key. O(|L|+|R|)
  * per partition, no buffering beyond one held right row — the shape that
  * survives 100 TB (state per task = one row).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeEval = BindReferences.bindReference(lTime, leftOut)
      val rTimeEval = BindReferences.bindReference(rTime, rightOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val joined = new JoinedRow
      // emit UnsafeRows (operator contract for downstream consumers)
      val resultProj = UnsafeProjection.create(leftOut ++ rightOut, leftOut ++ rightOut)

      var rNext: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var heldKey: InternalRow = null
      var heldRow: InternalRow = null

      lIter.flatMap { l =>
        val lk = lKeyProj(l)
        val ltv = lTimeEval.eval(l)
        // NULL never as-of-matches (DuckDB ASOF semantics): a left row
        // with a null key or time emits nothing, and null-key/time right
        // rows are skipped below rather than held — without these guards
        // a null left time NPEs on unboxing and null keys would match
        // each other under the natural ordering.
        if (ltv == null || lk.anyNull) Iterator.empty
        else {
          val lt = ltv.asInstanceOf[Long]
          var advancing = true
          while (advancing && rNext != null) {
            val rk = rKeyProj(rNext)
            val rtv = if (rk.anyNull) null else rTimeEval.eval(rNext)
            if (rk.anyNull || rtv == null) {
              // null sorts first under Ascending: skip past it
              rNext = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                rNext = if (rIter.hasNext) rIter.next().copy() else null
              } else if (c == 0 && rtv.asInstanceOf[Long] <= lt) {
                heldKey = rk.copy()
                heldRow = rNext
                rNext = if (rIter.hasNext) rIter.next().copy() else null
              } else {
                advancing = false
              }
            }
          }
          if (heldRow != null && keyOrd.compare(heldKey, lk) == 0) {
            Iterator.single[InternalRow](resultProj(joined(l, heldRow)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
