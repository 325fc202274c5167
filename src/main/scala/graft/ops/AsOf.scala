package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.{AsOfJoin, AsOfJoinExec}

/** Public API + planner strategy for the custom as-of join.
  *
  * `asofJoin(events, snapshots, "user_id", "ts_us")` attaches to every
  * left row the newest right row with the same key and right time ≤ left
  * time (inner semantics, like DuckDB's ASOF JOIN). Column names must be
  * disjoint apart from the join columns; rename the right side first.
  */
object AsOf {

  object AsOfStrategy extends Strategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** key/time columns resolved by name on each side; times must be
    * LongType (epoch micros). NULL keys and NULL times never match on
    * either side (DuckDB ASOF semantics): left rows with a null key/time
    * emit nothing, right rows with a null key/time are never held as the
    * as-of state.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    // planner strategies are additive and idempotent to re-register
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    for ((p, t) <- Seq(lp -> leftTime, rp -> rightTime))
      require(attr(p, t).dataType == org.apache.spark.sql.types.LongType,
        s"as-of time column $t must be LongType (epoch micros), got ${attr(p, t).dataType.catalogString}")
    ColumnBridge.ofRows(spark, AsOfJoin(lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
