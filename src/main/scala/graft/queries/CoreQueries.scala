package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational operators (SURVEY.md §2.3–§2.8) demonstrated over the
  * driver's star schema. Each query has a DuckDB oracle twin in
  * [[CoreQueries.oracles]]; all queries end in a deterministic total order.
  *
  * Scale notes (100 TB design mandate, SURVEY.md §4): every query is pure
  * shuffle-parallel DataFrame ops — no collect(), no driver state. Small
  * dimension tables (region/nation/customer/supplier and derived interval
  * tables) are broadcast explicitly so the big fact side never shuffles
  * for those joins.
  */
object CoreQueries {

  /** OP-30/31: conditional aggregation / cardinality — pricing summary
    * (TPC-H Q1-shaped on the driver's lineitem schema).
    * Map-side partial aggregation collapses 600k rows to ~6 groups before
    * the shuffle; decimal-cast sums keep the oracle hash-stable.
    */
  val q01PricingSummary: Q = (s, d) => {
    val priceC = cents(col("l_extendedprice"))
    val discP  = round(col("l_discount") * 100).cast("long") // percent units, exact
    val taxP   = round(col("l_tax") * 100).cast("long")
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(priceC).cast("double") / lit(100.0)).as("sum_base_price"),
        (sum(priceC * (lit(100L) - discP)).cast("double") / lit(10000.0)).as("sum_disc_price"),
        (sum(priceC * (lit(100L) - discP) * (lit(100L) + taxP)).cast("double") / lit(1000000.0)).as("sum_charge"),
        (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(priceC).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** OP-29: the flagship enrichment join (reference: routes ⋈ names ⋈ groups,
    * etl_controller.py:3288-3298) as the 5-way
    * lineitem⋈orders⋈customer⋈nation⋈region revenue rollup.
    * customer/nation/region are broadcast — only orders⋈lineitem shuffles,
    * and AQE picks the build side for that one at runtime.
    */
  val q02EnrichJoin5: Q = (s, d) => {
    val li = lineitem(s, d)
    val o  = orders(s, d)
    val c  = customer(s, d)
    val n  = nation(s, d)
    val r  = region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        (sum(cents(col("l_extendedprice")) * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / lit(10000.0)).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** OP-33: last-wins keyed state (reference: current_routes[out]=inp upsert,
    * etl_controller.py:2444, 2535-2537) — latest event per user_id.
    * Scales as one hash shuffle on the key; ties broken by event_id so the
    * result is total-order deterministic.
    */
  val q03LatestEvent: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** OP-28: interval lookup join (reference: get_router_for_output cumulative
    * offsets, etl_controller.py:248-284) — routers built from supplier with
    * running-total output ranges, probed by lineitem.l_quantity. Faithfully
    * replicates the reference's overflow clause: quantities beyond the last
    * router's range clamp to the last router (SURVEY.md §7.4 risk 5).
    * The interval table is tiny → broadcast range join, no fact shuffle
    * before the aggregation.
    */
  val q04IntervalRouterJoin: Q = (s, d) => {
    val routers = supplier(s, d)
      .select(col("s_suppkey"), (lit(3) + pmod(col("s_suppkey"), lit(5))).as("num_outputs"))
    // global (unpartitioned) running total — single-partition by design:
    // it runs over the ROUTER DIMENSION (|suppliers| rows, thousands at
    // most), never the fact table; WindowExec's all-to-one warning does
    // not indicate fact-table skew here
    val w = Window.orderBy(col("s_suppkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intervals = routers
      .withColumn("lo", coalesce(sum(col("num_outputs")).over(w), lit(0)) + lit(1))
      .withColumn("hi", col("lo") + col("num_outputs") - lit(1))
      .select(col("s_suppkey").as("router"), col("lo"), col("hi"))
    val last = intervals.orderBy(col("router").desc).limit(1)
      .select(col("router").as("last_router"), col("hi").as("last_hi"))
    // interval domain is small and dense → expand [lo,hi] to one row per
    // covered value and broadcast-hash-equi-join instead of a nested-loop
    // BETWEEN join (codegen'd hash probe vs per-row interval scan; the
    // generic range-join fallback only pays off for sparse/huge domains)
    val lookup = intervals.select(col("router"), explode(sequence(col("lo"), col("hi"))).as("q"))
    val li = lineitem(s, d).select(col("l_quantity").cast("long").as("q"))
    li.join(broadcast(lookup), Seq("q"), "left")
      .crossJoin(broadcast(last))
      .withColumn("router", coalesce(col("router"), col("last_router")))
      .groupBy(col("router"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
      .orderBy(col("router"))
  }

  /** OP-20: preset-scope semi-join (reference: snapshot only outputs in
    * group, etl_controller.py:3218-3239) — orders whose customer is in the
    * high-balance scope.
    */
  val q05SemiJoin: Q = (s, d) => {
    val scope = customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    orders(s, d)
      .join(broadcast(scope), col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))).cast("double") / lit(100.0)).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** Anti-join analog (reference: preset delete keeps non-matching,
    * etl_controller.py:3272-3281) — customers with no orders.
    */
  val q06AntiJoin: Q = (s, d) => {
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** OP-12: range-format RLE via gaps-and-islands (reference:
    * format_output_ranges, etl_controller.py:102-125). Consecutive ascending
    * runs of filtered order keys collapse to "lo-hi" segments, joined in
    * order — the exact formatting contract of the reference, demonstrated
    * per orderkey-bucket so it shuffles by bucket and scales.
    */
  val q07RleIslands: Q = (s, d) => {
    val keys = orders(s, d)
      .filter(col("o_totalprice") > 250000)
      .select((col("o_orderkey") % 500).cast("long").as("k"),
              floor(col("o_orderkey") / 500).as("bucket"))
      .distinct()
    val w = Window.partitionBy(col("bucket")).orderBy(col("k"))
    val segs = keys
      .withColumn("island", col("k") - row_number().over(w))
      .groupBy(col("bucket"), col("island"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .withColumn("seg",
        when(col("lo") === col("hi"), col("lo").cast("string"))
          .otherwise(concat(col("lo").cast("string"), lit("-"), col("hi").cast("string"))))
    segs
      .groupBy(col("bucket"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("lo"), col("seg")))), x => x.getField("seg")),
        ", ").as("rle"),
        count(lit(1)).as("n_runs"))
      .orderBy(col("bucket"))
  }

  /** Explicit frame-spec window (SURVEY.md §2.5): running revenue per
    * customer. One shuffle on o_custkey; decimal running sum keeps the
    * oracle exact.
    */
  val q08RunningWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("running_total",
        sum(cents(col("o_totalprice"))).over(w).cast("double") / lit(100.0))
      .select(col("o_custkey"), tsUs(col("o_orderdate")).as("od_us"),
        col("o_orderkey"), col("running_total"))
      .orderBy(col("o_custkey"), col("od_us"), col("o_orderkey"))
  }

  /** OP-32: group min/max span (reference: group header "min-max",
    * etl_controller.py:2071-2081).
    */
  val q09GroupSpan: Q = (s, d) => {
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        min(col("o_totalprice")).as("lo_price"),
        max(col("o_totalprice")).as("hi_price"),
        min(tsUs(col("o_orderdate"))).as("lo_date_us"),
        max(tsUs(col("o_orderdate"))).as("hi_date_us"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Row-set EXCEPT (SURVEY.md §2.7): machinery-segment customers that
    * never placed an urgent order.
    */
  val q10ExceptKeys: Q = (s, d) => {
    customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("ck"))
      .except(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("ck")))
      .orderBy(col("ck"))
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary"     -> q01PricingSummary,
    "q02_enrich_join5"        -> q02EnrichJoin5,
    "q03_latest_event"        -> q03LatestEvent,
    "q04_interval_router_join" -> q04IntervalRouterJoin,
    "q05_semi_join"           -> q05SemiJoin,
    "q06_anti_join"           -> q06AntiJoin,
    "q07_rle_islands"         -> q07RleIslands,
    "q08_running_window"      -> q08RunningWindow,
    "q09_group_span"          -> q09GroupSpan,
    "q10_except_keys"         -> q10ExceptKeys,
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """WITH li AS (
        |  SELECT *, CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount*100) AS BIGINT) AS disc_p,
        |    CAST(round(l_tax*100) AS BIGINT) AS tax_p
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(price_c * (100 - disc_p)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(price_c * (100 - disc_p) * (100 + tax_p)) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(price_c) AS DOUBLE) / 100.0 / count(*) AS avg_price,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        |  count(*) AS count_order
        |FROM li
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_enrich_join5" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q03_latest_event" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q04_interval_router_join" ->
      """WITH intervals AS (
        |  SELECT s_suppkey AS router,
        |    COALESCE(sum(3 + s_suppkey % 5) OVER (ORDER BY s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS lo,
        |    COALESCE(sum(3 + s_suppkey % 5) OVER (ORDER BY s_suppkey ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (3 + s_suppkey % 5) AS hi
        |  FROM supplier),
        |last AS (SELECT router AS last_router FROM intervals ORDER BY router DESC LIMIT 1)
        |SELECT COALESCE(i.router, last.last_router) AS router,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q
        |FROM lineitem
        |LEFT JOIN intervals i ON CAST(l_quantity AS BIGINT) BETWEEN i.lo AND i.hi
        |CROSS JOIN last
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q07_rle_islands" ->
      """WITH keys AS (
        |  SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS k,
        |    CAST(floor(o_orderkey / 500) AS BIGINT) AS bucket
        |  FROM orders WHERE o_totalprice > 250000),
        |islands AS (
        |  SELECT bucket, k, k - row_number() OVER (PARTITION BY bucket ORDER BY k) AS island
        |  FROM keys),
        |segs AS (
        |  SELECT bucket, island, min(k) AS lo, max(k) AS hi,
        |    CASE WHEN min(k) = max(k) THEN CAST(min(k) AS VARCHAR)
        |         ELSE CAST(min(k) AS VARCHAR) || '-' || CAST(max(k) AS VARCHAR) END AS seg
        |  FROM islands GROUP BY bucket, island)
        |SELECT bucket, string_agg(seg, ', ' ORDER BY lo) AS rle, count(*) AS n_runs
        |FROM segs GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q08_running_window" ->
      """SELECT o_custkey, epoch_us(o_orderdate) AS od_us, o_orderkey,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total
        |FROM orders
        |ORDER BY o_custkey, od_us, o_orderkey""".stripMargin,
    "q09_group_span" ->
      """SELECT o_orderpriority,
        |  min(o_totalprice) AS lo_price, max(o_totalprice) AS hi_price,
        |  min(epoch_us(o_orderdate)) AS lo_date_us, max(epoch_us(o_orderdate)) AS hi_date_us,
        |  count(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q10_except_keys" ->
      """SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'MACHINERY'
        |EXCEPT
        |SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY ck""".stripMargin,
  )
}
