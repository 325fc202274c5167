package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** The reference's state-maintenance write path (SURVEY.md §2.7/§2.8):
  * preset merge, display grouping, group set-algebra, ungroup/resize,
  * multi-router union — all shuffle-parallel, keyed formulations.
  */
object StateQueries {

  private val T1 = 1705708800000000L // 2024-01-20T00:00:00Z, µs
  private val T2 = 1706140800000000L // 2024-01-25T00:00:00Z, µs

  /** OP-19/21/22 — preset apply as a full-outer coalesce merge
    * (etl_controller.py:3241-3270): "current" = latest value per user
    * before T1; "preset" = latest in [T1, T2); preset rows override.
    */
  val q19PresetMerge: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    def latest(lo: Option[Long], hi: Long) = {
      val base = events(s, d).filter(col("ts_us") < hi)
      lo.fold(base)(l => base.filter(col("ts_us") >= l))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
    }
    val current = latest(None, T1).select(col("user_id"), col("value").as("cur_value"))
    val preset  = latest(Some(T1), T2).select(col("user_id"), col("value").as("preset_value"))
    current.join(preset, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("preset_value"), col("cur_value")).as("value"),
        when(col("preset_value").isNotNull, lit("preset")).otherwise(lit("current")).as("source"))
      .orderBy(col("user_id"))
  }

  /** OP-23 — display grouping (etl_controller.py:286-330): project a group
    * map onto a *reordered* display list; contiguous same-group runs fuse,
    * uncovered entries become singletons. Orders play outputs: display
    * order is a deterministic shuffle of o_orderkey, group name is
    * o_orderpriority, '3-MEDIUM' plays "uncovered".
    */
  val q20DisplayGroups: Q = (s, d) => {
    val base = orders(s, d)
      .filter(pmod(col("o_custkey"), lit(100)) === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority").as("name"),
        (col("o_orderpriority") =!= "3-MEDIUM").as("covered"),
        pmod(col("o_orderkey") * 7, lit(13)).as("dk"))
    val wDisp = Window.partitionBy(col("o_custkey")).orderBy(col("dk"), col("o_orderkey"))
    val flagged = base
      .withColumn("rn", row_number().over(wDisp))
      .withColumn("lag_cov", lag(col("covered"), 1).over(wDisp))
      .withColumn("lag_name", lag(col("name"), 1).over(wDisp))
      .withColumn("brk",
        when(col("lag_cov").isNull, 1)
          .when(!col("covered"), 1)
          .when(col("covered") =!= col("lag_cov"), 1)
          .when(col("name") =!= col("lag_name"), 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(wDisp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("o_custkey"), col("island"))
      .agg(
        min(when(col("covered"), col("name"))
          .otherwise(concat(lit("Out "), col("o_orderkey")))).as("group_name"),
        array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("o_orderkey")))),
            x => x.getField("o_orderkey").cast("string")), ",").as("outputs"),
        count(lit(1)).as("n"))
      .orderBy(col("o_custkey"), col("island"))
  }

  /** OP-24 + set-membership (etl_controller.py:2184-2221, 2160-2161):
    * group set-algebra with array_except / array_intersect / array_union
    * over per-brand part-size sets.
    */
  val q21GroupSetAlgebra: Q = (s, d) => {
    val hi = part(s, d).filter(col("p_retailprice") > 1400)
      .groupBy(col("p_brand")).agg(array_sort(collect_set(col("p_size"))).as("hi"))
    val lo = part(s, d).filter(col("p_retailprice") <= 1400)
      .groupBy(col("p_brand")).agg(array_sort(collect_set(col("p_size"))).as("lo"))
    val emptyInts = array().cast("array<int>")
    hi.join(lo, Seq("p_brand"), "full_outer")
      .select(col("p_brand"),
        coalesce(col("hi"), emptyInts).as("hi"),
        coalesce(col("lo"), emptyInts).as("lo"))
      .select(col("p_brand"),
        array_join(array_except(col("hi"), col("lo")), ",").as("only_hi"),
        size(array_except(col("hi"), col("lo"))).as("n_only_hi"),
        array_join(array_intersect(col("hi"), col("lo")), ",").as("common"),
        array_join(array_sort(array_union(col("hi"), col("lo"))), ",").as("all_sizes"))
      .orderBy(col("p_brand"))
  }

  /** OP-25/OP-26 — ungroup + resize reconcile (etl_controller.py:2268-2289,
    * 2932-2946): 5 groups of 5 outputs shrink to N=18 (trim, drop empties),
    * then growth to 28 appends singleton groups.
    */
  val q22UngroupResize: Q = (s, d) => {
    val groups = region(s, d).select(col("r_name").as("name"),
      sequence(col("r_regionkey") * 5 + 1, col("r_regionkey") * 5 + 5).as("outputs"))
    val shrunk = groups
      .withColumn("outputs", filter(col("outputs"), o => o <= 18))
      .filter(size(col("outputs")) > 0)
    val singles = region(s, d).limit(1)
      .select(explode(sequence(lit(26), lit(28))).as("o"))
      .select(concat(lit("Out "), col("o")).as("name"), array(col("o")).as("outputs"))
    shrunk.union(singles)
      .select(col("name"), array_join(col("outputs"), ",").as("outputs"),
        size(col("outputs")).as("n"), array_min(col("outputs")).as("first_out"))
      .orderBy(col("first_out"), col("name"))
  }

  /** OP-27 + OP-33 — multi-router union with cumulative key offset
    * (etl_controller.py:2998-3084): event types play routers (capacity =
    * max user + 1), outputs shift by the preceding routers' capacities,
    * then last-wins per global output.
    */
  val q23UnionOffset: Q = (s, d) => {
    val caps = events(s, d).groupBy(col("event_type"))
      .agg((max(col("user_id")) + 1).as("cap"))
    // global (unpartitioned) running total — single-partition by design:
    // it runs over the per-ROUTER capacity table (|event_types| rows),
    // never the event stream; WindowExec's all-to-one warning does not
    // indicate fact-table skew here
    val wOff = Window.orderBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = caps.withColumn("offset", coalesce(sum(col("cap")).over(wOff), lit(0L)))
    val wLatest = Window.partitionBy(col("global_output"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events(s, d)
      .join(broadcast(offs), Seq("event_type"))
      .withColumn("global_output", col("user_id") + 1 + col("offset"))
      .withColumn("input", (pmod(round(col("value")).cast("long"), lit(64)) + 1).cast("int"))
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("global_output"), col("input"), col("event_type"), col("ts_us"))
      .orderBy(col("global_output"))
  }

  val queries: Map[String, Q] = Map(
    "q19_preset_merge"      -> q19PresetMerge,
    "q20_display_groups"    -> q20DisplayGroups,
    "q21_group_set_algebra" -> q21GroupSetAlgebra,
    "q22_ungroup_resize"    -> q22UngroupResize,
    "q23_union_offset"      -> q23UnionOffset,
  )

  val oracles: Map[String, String] = Map(
    "q19_preset_merge" ->
      """WITH cur AS (
        |  SELECT user_id, value AS cur_value FROM (
        |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE epoch_us(ts) < 1705708800000000) WHERE rn = 1),
        |pre AS (
        |  SELECT user_id, value AS preset_value FROM (
        |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |    FROM events WHERE epoch_us(ts) >= 1705708800000000 AND epoch_us(ts) < 1706140800000000) WHERE rn = 1)
        |SELECT COALESCE(cur.user_id, pre.user_id) AS user_id,
        |  COALESCE(preset_value, cur_value) AS value,
        |  CASE WHEN preset_value IS NOT NULL THEN 'preset' ELSE 'current' END AS source
        |FROM cur FULL OUTER JOIN pre ON cur.user_id = pre.user_id
        |ORDER BY user_id""".stripMargin,
    "q20_display_groups" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey, o_orderpriority AS name,
        |    o_orderpriority <> '3-MEDIUM' AS covered,
        |    (o_orderkey * 7) % 13 AS dk
        |  FROM orders WHERE o_custkey % 100 = 0),
        |flagged AS (
        |  SELECT *,
        |    row_number() OVER w AS rn,
        |    lag(covered) OVER w AS lag_cov,
        |    lag(name) OVER w AS lag_name
        |  FROM base
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY dk, o_orderkey)),
        |brk AS (
        |  SELECT *,
        |    CASE WHEN lag_cov IS NULL THEN 1
        |         WHEN NOT covered THEN 1
        |         WHEN covered <> lag_cov THEN 1
        |         WHEN name <> lag_name THEN 1
        |         ELSE 0 END AS b
        |  FROM flagged),
        |isl AS (
        |  SELECT *, sum(b) OVER (PARTITION BY o_custkey ORDER BY dk, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM brk)
        |SELECT o_custkey, CAST(island AS BIGINT) AS island,
        |  min(CASE WHEN covered THEN name ELSE 'Out ' || CAST(o_orderkey AS VARCHAR) END) AS group_name,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS outputs,
        |  count(*) AS n
        |FROM isl GROUP BY o_custkey, island
        |ORDER BY o_custkey, island""".stripMargin,
    "q21_group_set_algebra" ->
      """WITH hi AS (SELECT DISTINCT p_brand, p_size FROM part WHERE p_retailprice > 1400),
        |lo AS (SELECT DISTINCT p_brand, p_size FROM part WHERE p_retailprice <= 1400),
        |brands AS (SELECT DISTINCT p_brand FROM part),
        |only_hi AS (
        |  SELECT h.p_brand, string_agg(CAST(h.p_size AS VARCHAR), ',' ORDER BY h.p_size) AS s, count(*) AS n
        |  FROM hi h WHERE NOT EXISTS (SELECT 1 FROM lo l WHERE l.p_brand = h.p_brand AND l.p_size = h.p_size)
        |  GROUP BY h.p_brand),
        |common AS (
        |  SELECT h.p_brand, string_agg(CAST(h.p_size AS VARCHAR), ',' ORDER BY h.p_size) AS s
        |  FROM hi h WHERE EXISTS (SELECT 1 FROM lo l WHERE l.p_brand = h.p_brand AND l.p_size = h.p_size)
        |  GROUP BY h.p_brand),
        |allu AS (
        |  SELECT p_brand, string_agg(CAST(p_size AS VARCHAR), ',' ORDER BY p_size) AS s
        |  FROM (SELECT DISTINCT p_brand, p_size FROM part) GROUP BY p_brand)
        |SELECT b.p_brand,
        |  COALESCE(o.s, '') AS only_hi, CAST(COALESCE(o.n, 0) AS INT) AS n_only_hi,
        |  COALESCE(c.s, '') AS common, COALESCE(a.s, '') AS all_sizes
        |FROM brands b
        |LEFT JOIN only_hi o ON b.p_brand = o.p_brand
        |LEFT JOIN common c ON b.p_brand = c.p_brand
        |LEFT JOIN allu a ON b.p_brand = a.p_brand
        |ORDER BY b.p_brand""".stripMargin,
    "q22_ungroup_resize" ->
      """WITH g AS (SELECT r_name AS name, r_regionkey*5 + 1 AS lo, r_regionkey*5 + 5 AS hi FROM region),
        |vals AS (SELECT name, unnest(generate_series(lo, hi)) AS v FROM g),
        |shrunk AS (
        |  SELECT name, string_agg(CAST(v AS VARCHAR), ',' ORDER BY v) AS outputs,
        |    CAST(count(*) AS INT) AS n, CAST(min(v) AS INT) AS first_out
        |  FROM vals WHERE v <= 18 GROUP BY name),
        |singles AS (
        |  SELECT 'Out ' || CAST(v AS VARCHAR) AS name, CAST(v AS VARCHAR) AS outputs,
        |    1 AS n, CAST(v AS INT) AS first_out
        |  FROM (SELECT unnest(generate_series(26, 28)) AS v))
        |SELECT name, outputs, n, first_out FROM shrunk
        |UNION ALL SELECT name, outputs, n, first_out FROM singles
        |ORDER BY first_out, name""".stripMargin,
    "q23_union_offset" ->
      """WITH caps AS (SELECT event_type, max(user_id) + 1 AS cap FROM events GROUP BY event_type),
        |offs AS (
        |  SELECT event_type,
        |    COALESCE(sum(cap) OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM caps),
        |merged AS (
        |  SELECT e.user_id + 1 + o.off AS global_output,
        |    CAST(CAST(round(e.value) AS BIGINT) % 64 + 1 AS INT) AS input,
        |    e.event_type, epoch_us(e.ts) AS ts_us, e.event_id
        |  FROM events e JOIN offs o ON e.event_type = o.event_type),
        |latest AS (
        |  SELECT *, row_number() OVER (PARTITION BY global_output ORDER BY ts_us DESC, event_id DESC) rn
        |  FROM merged)
        |SELECT CAST(global_output AS BIGINT) AS global_output, input, event_type, ts_us
        |FROM latest WHERE rn = 1
        |ORDER BY global_output""".stripMargin,
  )
}
