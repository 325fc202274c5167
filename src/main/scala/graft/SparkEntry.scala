package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 demonstrated
  * over the driver's parquet star schema; [[oracleSql]] holds the DuckDB
  * twin the driver hash-compares against (column names aliased identically
  * on both sides; every query ends in a deterministic total ORDER BY).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way enrichment join (SURVEY.md §7.2): scan → filter → join →
    * agg → sort, all Catalyst built-ins.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02EnrichJoin5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ProtocolQueries.queries ++
      StateQueries.queries ++ AnalyticsQueries.queries ++ TextQueries.queries ++
      MiscQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ProtocolQueries.oracles ++
      StateQueries.oracles ++ AnalyticsQueries.oracles ++ TextQueries.oracles ++
      MiscQueries.oracles ++ PipelineQueries.oracles
}
