package graft.ops

import org.apache.spark.sql.SparkSession

/** Conf-gated AQE scope for the FIXED-SHAPE unrolled loops (beam hops,
  * heuristic-2 prune steps, Lloyd iterations, CC rounds).
  *
  * Why: GraphDecomp (round 14) proved the graph family's wall at test
  * SFs is per-JOB overhead — the loops' job counts are code-fixed and
  * jobs × measured overhead reconstructs every round's reading. Under
  * AQE each eagerly-materialized step re-plans per query stage and
  * submits one job per exchange, so a 4-hop beam with a distinct, a
  * window, and two joins per hop pays ~4-6 jobs per hop. The loops'
  * shapes are KNOWN (that is what lets the DuckDB oracle unroll them),
  * so adaptive re-planning buys nothing there: with AQE off each step
  * is one job (plus its broadcast-collect jobs), all stages inside.
  *
  * Scope discipline (the q145 conf-gate rule): the body must
  * materialize everything it returns — every loop step ends in an
  * eager `localCheckpoint`, so the AQE-off planning can never leak
  * into a caller's plan; the conf restores in `finally`. Nesting is
  * safe (each scope restores what it saw).
  *
  * 100 TB note: this is NOT "AQE off for big queries". The scoped
  * loops operate on beam-bounded (|queries|·B), degree-bounded (≤K per
  * vertex), or k-row (centroid/codebook) tables whose join keys are
  * occupancy- or degree-capped by construction — the skew AQE exists
  * to re-plan cannot occur. Corpus-sized scans (the one-time substrate
  * builds, the audit tails) stay outside the scope and keep AQE.
  */
object LoopScope {
  private val Key = "spark.sql.adaptive.enabled"

  /** The per-step eager checkpoint for loops running under [[aqeOff]]:
    * `localCheckpoint(true)` + layout sanitation. Non-adaptive
    * execution makes the checkpoint capture REAL physical
    * partitioning/ordering, and a step whose tail sorts by columns the
    * final projection drops (SMJ keys, window order columns) captures
    * a SortOrder over pre-projection attributes — poisoning every
    * persisted descendant's cache entry (see
    * [[org.apache.spark.sql.graft.ColumnBridge.stripDanglingLayout]]).
    * All scoped loops checkpoint through this helper.
    */
  def ckpt(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.stripDanglingLayout(df.localCheckpoint(true))

  /** `.loopCkpt` suffix form of [[ckpt]] for the loop bodies. */
  implicit class CkptOps(private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
    def loopCkpt: org.apache.spark.sql.DataFrame = ckpt(df)
  }

  def aqeOff[T](s: SparkSession)(body: => T): T = {
    val prev = s.conf.getOption(Key)
    s.conf.set(Key, "false")
    try body
    finally prev match {
      case Some(v) => s.conf.set(Key, v)
      case None => s.conf.unset(Key)
    }
  }
}
