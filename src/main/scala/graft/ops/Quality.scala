package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline data-quality instrumentation via `observe()` — metrics are
  * accumulated during the query's own pass (no second scan), the shape a
  * 100 TB ingest wants for QC gates.
  */
object Quality {

  /** Attach standard QC metrics for the given columns: total rows, per-
    * column null counts, and distinct-ish key health for `keyCol`.
    * Returns the instrumented frame + the Observation to read after an
    * action completes.
    */
  def observed(df: DataFrame, name: String, keyCol: String, cols: Seq[String]): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("rows") +:
        count(col(keyCol)).as("key_nonnull") +:
        approx_count_distinct(col(keyCol)).as("key_approx_distinct") +:
        cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Evaluate simple expectations against observed metrics; returns
    * violation messages (empty = healthy).
    */
  def expect(metrics: Map[String, Any])(
      checks: (String, Any => Boolean, String)*): Seq[String] =
    checks.flatMap { case (metric, ok, msg) =>
      metrics.get(metric) match {
        case Some(v) if ok(v) => None
        case Some(v) => Some(s"$msg (got $v)")
        case None => Some(s"metric $metric missing")
      }
    }
}
