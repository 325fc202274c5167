package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sinks mirroring the reference's exports (SURVEY.md §2.1).
  */
object Sinks {

  /** OP-29 projection feeding OP-3 — enrich a route table
    * `(output int, input int)` with group names (first group containing
    * the output wins) and input names (default "Input n"), ordered by
    * output (etl_controller.py:3288-3298).
    *
    * groups: (name string, outputs array<int>); inputNames:
    * (input int, name string). Both dimension tables broadcast.
    */
  def enrichedRoutes(routes: DataFrame, groups: DataFrame, inputNames: DataFrame): DataFrame = {
    // first matching group per output: explode + min by group position.
    // groups is a config-derived dimension: coalesce to one partition so
    // monotonically_increasing_id reflects the configured order even if
    // the frame arrives multi-partitioned (per-partition id blocks would
    // otherwise disagree with insertion order)
    val groupOf = groups.coalesce(1)
      .withColumn("gpos", monotonically_increasing_id())
      .select(col("name").as("g_name"), col("gpos"), explode(col("outputs")).as("output"))
      .groupBy(col("output"))
      .agg(min(struct(col("gpos"), col("g_name"))).getField("g_name").as("output_name"))
    routes
      .join(broadcast(groupOf), Seq("output"), "left")
      .join(broadcast(inputNames.select(col("input"), col("name").as("input_name"))),
        Seq("input"), "left")
      .select(
        col("output").as("Output"),
        col("input").as("Input"),
        coalesce(col("output_name"), lit("")).as("Output Name"),
        coalesce(col("input_name"), concat(lit("Input "), col("input"))).as("Input Name"))
      .orderBy(col("Output"))
  }

  /** OP-3 — CSV routes export with the reference's exact header and row
    * order (etl_controller.py:3283-3301). coalesce(1) mirrors the
    * single-file export; drop it for cluster-scale writes.
    */
  def exportRoutesCsv(routes: DataFrame, groups: DataFrame, inputNames: DataFrame,
      path: String, singleFile: Boolean = true): Unit = {
    val df = enrichedRoutes(routes, groups, inputNames)
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true")
      .option("emptyValue", "") // reference writes bare empties, not ""
      .csv(path)
  }

  /** OP-6 — append-only raw-frame log `[HH:MM:SS] KIND: payload`
    * (etl_controller.py:722-733). Takes (ts_us long, kind string,
    * raw string); timestamps render in the session zone (UTC).
    */
  def appendLog(frames: DataFrame, path: String): Unit =
    frames
      .select(concat(
        lit("["), date_format(timestamp_micros(col("ts_us")), "HH:mm:ss"), lit("] "),
        col("kind"), lit(": "), trim(col("raw"))).as("value"))
      .write.mode("append").text(path)

  /** OP-4 batch twin — scan captured frames back out of the log format
    * into (time string, kind, raw) rows; malformed lines drop out.
    */
  def readLog(spark: SparkSession, path: String): DataFrame = {
    val pat = "^\\[(\\d{2}:\\d{2}:\\d{2})\\] ([A-Z]+): (.*)$"
    spark.read.text(path)
      .select(
        regexp_extract(col("value"), pat, 1).as("time"),
        regexp_extract(col("value"), pat, 2).as("kind"),
        regexp_extract(col("value"), pat, 3).as("raw"))
      .filter(col("kind") =!= "")
  }
}
