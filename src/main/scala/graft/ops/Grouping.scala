package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OP-23 — display grouping (reference: get_display_groups,
  * etl_controller.py:286-330): project the configured group map onto the
  * *currently displayed, possibly reordered* output list. Contiguous runs
  * of the same (name, color) fuse into one display group; outputs not
  * covered by any group become singleton groups named "Out n" with the
  * default color. A group split by the display order yields multiple
  * display runs (the reference subtlety SURVEY.md §7.4 risk 4 calls out).
  */
object Grouping {

  val UncoveredColor = "#b0b0b0"

  /** display: (session, pos, output) — one row per displayed output in
    * display order (pos), partitioned by `session`;
    * groupMap: (output, name, color) — one group per output. NOTE the
    * reference's duplicate resolution here is LAST group wins
    * (group_map[out] is overwritten in config order,
    * etl_controller.py:293-297) — the opposite of the CSV export's
    * first-match `break` (Sinks.enrichedRoutes); resolve duplicates
    * upstream accordingly.
    * Returns one row per display group, in order:
    * (session, grp_idx, name, color, outputs csv, n).
    */
  def displayGroups(display: DataFrame, groupMap: DataFrame): DataFrame = {
    val joined = display.join(broadcast(groupMap), Seq("output"), "left")
      .withColumn("covered", col("name").isNotNull)
    val w = Window.partitionBy(col("session")).orderBy(col("pos"))
    joined
      .withColumn("lag_cov", lag(col("covered"), 1).over(w))
      .withColumn("lag_name", lag(col("name"), 1).over(w))
      .withColumn("lag_color", lag(col("color"), 1).over(w))
      .withColumn("brk",
        when(col("lag_cov").isNull, 1)                       // first row
          .when(!col("covered"), 1)                          // singleton
          .when(col("covered") =!= col("lag_cov"), 1)        // cover edge
          .when(col("name") =!= col("lag_name"), 1)          // group edge
          .when(col("color") =!= col("lag_color"), 1)        // color edge
          .otherwise(0))
      .withColumn("grp_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("session"), col("grp_idx"))
      .agg(
        min(when(col("covered"), col("name"))
          .otherwise(concat(lit("Out "), col("output")))).as("name"),
        min(when(col("covered"), col("color")).otherwise(lit(UncoveredColor))).as("color"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("output")))),
          x => x.getField("output").cast("string")), ",").as("outputs"),
        count(lit(1)).as("n"))
      .orderBy(col("session"), col("grp_idx"))
  }
}
