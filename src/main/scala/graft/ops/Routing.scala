package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OP-28 — combined-output → (router, local output) resolution
  * (reference: RouterConfig.get_router_for_output,
  * etl_controller.py:248-284), as a broadcast interval join over a
  * dataframe of outputs. Faithful to the reference's quirks:
  *
  *  - no combining (or no additional routers) ⇒ everything is primary
  *  - routers with zero outputs are skipped when matching
  *  - outputs beyond all routers clamp to the LAST additional router with
  *    local = output − (primary + Σ additional[:-1]) — the last router's
  *    own capacity is deliberately ignored (SURVEY.md §7.4 risk 5; do not
  *    "fix")
  */
object Routing {

  /** outputs: DataFrame with an `output` int column; returns
    * (output, router_idx, local_output). Router config is driver-side
    * scalar state, exactly like the reference's config document.
    */
  def resolveOutputs(
      outputs: DataFrame,
      primaryOutputs: Int,
      additional: Seq[Int],
      combineRouters: Boolean): DataFrame = {
    val spark = outputs.sparkSession
    import spark.implicits._
    if (!combineRouters || additional.isEmpty) {
      return outputs.select(col("output"),
        lit(0).as("router_idx"), col("output").as("local_output"))
    }
    // interval table: primary + non-zero additional routers, cumulative
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    rows += ((0, 1L, primaryOutputs.toLong, 0L))
    var running = primaryOutputs.toLong
    additional.zipWithIndex.foreach { case (n, i) =>
      if (n > 0) {
        rows += ((i + 1, running + 1, running + n, running))
        running += n
      }
    }
    val intervals = rows.toSeq.toDF("router_idx", "lo", "hi", "off")
    val lastIdx = additional.length
    val lastOffset = primaryOutputs.toLong + additional.dropRight(1).map(_.toLong).sum
    outputs
      .join(broadcast(intervals), col("output").between(col("lo"), col("hi")), "left")
      .select(col("output"),
        coalesce(col("router_idx"), lit(lastIdx)).as("router_idx"),
        coalesce(col("output") - col("off"), col("output") - lastOffset)
          .cast("int").as("local_output"))
  }
}
