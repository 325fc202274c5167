package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A harness query: (session, sfDir) => result DataFrame.
    * Contract (SURVEY.md §5): deterministic total ORDER BY, no raw
    * float reductions (see [[qsum8]]), timestamps as unix_micros.
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

  /** Order-independent, cross-engine-exact sum of a double expression,
    * quantized to 8 decimal digits.
    *
    * Per-row double arithmetic is IEEE-754 deterministic across engines;
    * only the *reduction* order varies (Spark partial aggs vs DuckDB).
    * `floor(e*1e8)` is the same double→long mapping in both engines (no
    * rounding mode involved — unlike a double→DECIMAL cast, whose
    * half-even ties at the 8th digit each engine may break differently,
    * e.g. e = 1/512 exactly). Long sums are order-independent, and the
    * final long→double cast is deterministic.
    * DuckDB twin: CAST(sum(CAST(floor(e*100000000.0) AS BIGINT)) AS BIGINT).
    */
  def qsum8(e: Column): Column =
    sum(floor(e * lit(1e8)).cast("long"))

  /** Exact cross-engine average of [[qsum8]]-quantized doubles: cast the
    * long sum to double, de-quantize, divide by count — left-associated,
    * so the DuckDB twin must also be
    * `CAST(S AS DOUBLE) / 100000000.0 / count(*)`.
    */
  def qmean8(e: Column): Column =
    qsum8(e).cast("double") / lit(1e8) / count(lit(1))

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
