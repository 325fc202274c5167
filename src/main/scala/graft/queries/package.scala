package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A harness query: (session, sfDir) => result DataFrame.
    * Contract (SURVEY.md §5): deterministic total ORDER BY, no raw
    * float reductions (see [[dsum]]), timestamps as unix_micros.
    */
  type Q = (SparkSession, String) => DataFrame

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
