package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table readers for the driver's star schema (TESTDATA.md / FIXTURES.md).
  *
  * All queries take an `sfDir` and read parquet lazily; Catalyst pushes
  * filters/column pruning into the scan, so readers stay dumb on purpose.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads as
    * a long (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench
    * sessions). Canonicalize to `ts_us` (epoch micros, bigint) so every
    * query sees one schema regardless of the session's parquet settings;
    * DuckDB's epoch_us() truncates nanos identically.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    val tsCol = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsCol).drop("ts")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
