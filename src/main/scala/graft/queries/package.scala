package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A harness query: (session, sfDir) => result DataFrame.
    * Contract (SURVEY.md §5): deterministic total ORDER BY, no raw
    * float reductions (see [[dsum]]), timestamps as unix_micros.
    *
    * Cache contract: queries persist intermediates read by multiple DAG
    * branches (invariant 6) via [[tracked]]; those frames stay cached
    * after the caller's action completes. Run-many callers must either
    * `spark.catalog.clearCache()` between queries (Bench/Verify do) or
    * call [[releasePersisted]] after each action (specs do) — otherwise
    * cached blocks accumulate across calls.
    */
  type Q = (SparkSession, String) => DataFrame

  private val persistedFrames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** `df.persist()` + register the frame so [[releasePersisted]] can
    * unpersist it once the caller's action has run. (Unpersisting inside
    * the lazy query itself would drop the cache mark before it is ever
    * used, so cleanup has to be the caller's post-action step.)
    */
  def tracked(df: DataFrame): DataFrame = { persistedFrames.add(df.persist()); df }

  /** Unpersist every [[tracked]] frame (non-blocking); returns the count
    * released. Safe to call after every action; idempotent when empty.
    */
  def releasePersisted(): Int = {
    var n = 0
    var df = persistedFrames.poll()
    while (df != null) { df.unpersist(false); n += 1; df = persistedFrames.poll() }
    n
  }

  /** Order-independent, cross-engine-exact sum of a double expression.
    *
    * Per-row double arithmetic is IEEE-754 deterministic across engines;
    * only the *reduction* order varies (Spark partial aggs vs DuckDB).
    * Casting each row to DECIMAL(30,8) first makes the sum exact and
    * order-independent; the final cast back to double is deterministic.
    * DuckDB twin: CAST(sum(CAST(e AS DECIMAL(30,8))) AS DOUBLE).
    */
  def dsum(e: Column): Column =
    sum(e.cast("decimal(30,8)")).cast("double")

  /** Exact cross-engine average: decimal sum / count, divided in double. */
  def davg(e: Column): Column =
    dsum(e) / count(lit(1))

  /** Exact integer cents of a 2-decimal money column (driver data keeps all
    * money at 2 decimals; fp error ≤4e-9, far from any rounding tie). Sums
    * over longs are order-independent and cross-engine exact — unlike double
    * or even double→decimal sums, whose per-row cast rounding can differ
    * between engines. DuckDB twin: CAST(round(e*100) AS BIGINT).
    */
  def cents(e: Column): Column = round(e * 100).cast("long")

  /** Timestamp column → epoch micros (bigint), matching DuckDB epoch_us().
    * The driver parquet stores naive timestamps (Spark 4 reads them as
    * TIMESTAMP_NTZ); with the session pinned UTC the cast is value-preserving.
    */
  def tsUs(e: Column): Column = unix_micros(e.cast("timestamp"))
}
