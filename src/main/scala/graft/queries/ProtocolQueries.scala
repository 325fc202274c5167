package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.{Colors, Protocol, RangeDsl}

/** The reference's decode/scalar operator surface (SURVEY.md §2.2)
  * demonstrated over the driver tables: frames are synthesized
  * deterministically from table columns, decoded by the graft.ops
  * combinators, and the DuckDB oracle derives the expected result
  * *independently* (from the source columns, not by re-parsing strings) —
  * a stronger check than a mirrored implementation.
  */
object ProtocolQueries {

  /** OP-7 — STATUS frame decode. Per user, events (ordered by event_id)
    * become the comma-separated STATUS payload — 'error' events produce a
    * non-digit part that the decoder must skip, shifting nothing (outputs
    * stay positional).
    */
  val q11StatusDecode: Q = (s, d) => {
    val parts = events(s, d).select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "error", lit("x"))
        .otherwise(round(col("value")).cast("long").cast("string")).as("part"))
    val frames = parts.groupBy(col("user_id")).agg(
      concat(lit("{BASTATUS,"),
        graft.functions.StructSortJoin(
          collect_list(struct(col("event_id"), col("part"))), ","),
        lit("}")).as("frame"))
    frames
      .select(col("user_id"), explode(graft.functions.StatusDecode(col("frame"))).as("r"))
      .select(col("user_id"), col("r.output").as("output"), col("r.input").as("input"))
      .orderBy(col("user_id"), col("output"))
  }

  /** OP-13/OP-14 — both checksum algorithms + route-frame assembly over
    * lineitem-derived crosspoints.
    */
  val q12FrameChecksums: Q = (s, d) => {
    val base = lineitem(s, d)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(256)).cast("int").as("out"),
        pmod(col("l_suppkey"), lit(256)).cast("int").as("inp"))
    base
      .withColumn("frame", Protocol.routeFrame(col("out"), col("inp")))
      .withColumn("route_cs", Protocol.routeChecksum(col("out"), col("inp")))
      .withColumn("telemetry_cmd",
        format_string("{ABcM,%02d,%02d,01}", pmod(col("out"), lit(100)), pmod(col("inp"), lit(100))))
      .withColumn("xor_cs", Protocol.xorChecksum(col("telemetry_cmd")))
      .select(col("l_orderkey"), col("l_linenumber"), col("out"), col("inp"),
        col("frame"), col("route_cs"), col("xor_cs"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** OP-10 — chassis telemetry decode: frames synthesized per event,
    * decoded to 9 (parameter, value) rows each (3 temps, 5 fans, door).
    */
  val q13ChassisDecode: Q = (s, d) => {
    val src = events(s, d)
      .filter(pmod(col("event_id"), lit(20)) === 0)
      .select(col("event_id"), col("user_id"),
        (lit(150) + pmod(col("event_id") * 7, lit(300))).as("t1"),
        (lit(200) + pmod(col("event_id") * 13, lit(250))).as("t2"),
        (lit(180) + pmod(col("event_id") * 3, lit(220))).as("t3"),
        pmod(col("event_id") * 17, lit(30000)).as("f1"),
        when(pmod(col("event_id"), lit(3)) === 0, lit(0))
          .otherwise(pmod(col("event_id") * 23, lit(30000))).as("f2"),
        pmod(col("event_id") * 29, lit(30000)).as("f3"),
        pmod(col("event_id") * 31, lit(30000)).as("f4"),
        pmod(col("event_id") * 37, lit(30000)).as("f5"),
        when(pmod(col("user_id"), lit(2)) === 0, lit("S")).otherwise(lit("O")).as("door"))
    val raw = concat(lit("{BAcC,00,00,"),
      lit("O"), col("door"), lit("O"),
      format_string("+%03dO+%03dO+%03d", col("t1"), col("t2"), col("t3")),
      lit("OOO"),
      format_string("%05dO%05dO%05dO%05dO%05dO", col("f1"), col("f2"), col("f3"), col("f4"), col("f5")),
      lit("}"))
    src.withColumn("raw", raw)
      .select(col("event_id"), posexplode(Protocol.chassisRows(col("raw"))))
      .select(col("event_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.parameter").as("parameter"), col("col.value").as("value"))
      .orderBy(col("event_id"), col("rn"))
  }

  /** OP-11 — range-DSL parse: ascending range, descending range, and a
    * malformed part per nation key; exploded with positions.
    */
  val q14RangeDslParse: Q = (s, d) => {
    val k = col("n_nationkey").cast("int")
    nation(s, d)
      .select(col("n_nationkey"),
        format_string("%d, %d-%d, x%d, %d-%d", k, k + 2, k + 5, k, k + 12, k + 9).as("dsl"))
      .select(col("n_nationkey"), col("dsl"),
        posexplode(RangeDsl.parseRangeDsl(col("dsl"))))
      .select(col("n_nationkey"), col("dsl"), (col("pos") + 1).cast("int").as("pos"),
        col("col").cast("int").as("val"))
      .orderBy(col("n_nationkey"), col("pos"))
  }

  /** OP-12 — range-format as a pure scalar fold (the single-pass
    * formulation of q07's relational islands): sorted distinct
    * o_orderkey%50 per customer, RLE-collapsed.
    */
  val q15RangeDslFormat: Q = (s, d) => {
    orders(s, d)
      .select(col("o_custkey"), pmod(col("o_orderkey"), lit(50)).cast("int").as("v"))
      .distinct()
      .groupBy(col("o_custkey"))
      .agg(RangeDsl.formatRangeDsl(array_sort(collect_list(col("v")))).as("rle"))
      .orderBy(col("o_custkey"))
  }

  /** OP-15/16/17 — color scalar chain: hash-seeded pastel → contrast
    * color → luminance shifts (hex parsed back per step).
    */
  val q16Colors: Q = (s, d) => {
    nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
      .withColumn("pastel", Colors.pastelColor(col("n_nationkey")))
      .withColumn("contrast", Colors.contrastColor(col("pastel")))
      .withColumn("brighter", Colors.adjustLuminance(col("pastel"), lit(20)))
      .withColumn("darker", Colors.adjustLuminance(col("pastel"), lit(-20)))
      .orderBy(col("n_nationkey"))
  }

  /** OP-18 — IP dotted-quad validation over synthesized addresses (some
    * octets overflow 255; every 11th key gets a malformed 5th octet).
    */
  val q17IpValid: Q = (s, d) => {
    val ip0 = concat_ws(".",
      pmod(col("c_custkey"), lit(300)),
      pmod(col("c_nationkey") * 13, lit(256)),
      pmod(col("c_custkey") * 7, lit(300)),
      pmod(col("c_custkey"), lit(256)))
    customer(s, d)
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(11)) === 0, concat(ip0, lit(".9")))
          .otherwise(ip0).as("ip"))
      .withColumn("valid", Colors.isValidIp(col("ip")))
      .orderBy(col("c_custkey"))
  }

  /** OP-8/OP-9 — device-info + matrix-size decode, including unparseable
    * frames → null.
    */
  val q18DeviceInfo: Q = (s, d) => {
    val info = when(pmod(col("p_partkey"), lit(10)) === 0, lit("{GARBAGE}"))
      .otherwise(format_string("{BBI,%s,FW%d.%d}", col("p_brand"),
        pmod(col("p_partkey"), lit(10)), pmod(col("p_partkey"), lit(7))))
    val sizeFrame = format_string("{BAM?,%d,%d}",
      lit(8) + pmod(col("p_partkey"), lit(9)), lit(16) + pmod(col("p_partkey"), lit(17)))
    part(s, d)
      .select(col("p_partkey"),
        Protocol.deviceInfo(info).as("device_info"),
        Protocol.matrixSize(sizeFrame).getField("num_inputs").as("num_inputs"),
        Protocol.matrixSize(sizeFrame).getField("num_outputs").as("num_outputs"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q11_status_decode"    -> q11StatusDecode,
    "q12_frame_checksums"  -> q12FrameChecksums,
    "q13_chassis_decode"   -> q13ChassisDecode,
    "q14_range_dsl_parse"  -> q14RangeDslParse,
    "q15_range_dsl_format" -> q15RangeDslFormat,
    "q16_colors"           -> q16Colors,
    "q17_ip_valid"         -> q17IpValid,
    "q18_device_info"      -> q18DeviceInfo,
  )

  val oracles: Map[String, String] = Map(
    "q11_status_decode" ->
      """WITH parts AS (
        |  SELECT user_id,
        |    CASE WHEN event_type = 'error' THEN 'x'
        |         ELSE CAST(CAST(round(value) AS BIGINT) AS VARCHAR) END AS part,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS pos
        |  FROM events)
        |SELECT user_id, CAST(pos AS INT) AS output, CAST(part AS INT) AS input
        |FROM parts WHERE regexp_matches(part, '^[0-9]+$')
        |ORDER BY user_id, output""".stripMargin,
    "q12_frame_checksums" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(l_partkey % 256 AS INT) AS out, CAST(l_suppkey % 256 AS INT) AS inp
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |cs AS (
        |  SELECT *,
        |    106 + (out // 100) + (out // 10) % 10 + out % 10
        |        + (inp // 100) + (inp // 10) % 10 + inp % 10 AS v,
        |    printf('{ABcM,%02d,%02d,01}', out % 100, inp % 100) AS cmd
        |  FROM base),
        |cs2 AS (
        |  SELECT *, CASE WHEN v > 126 THEN v - 95 ELSE v END AS route_cs,
        |    list_reduce(list_transform(generate_series(1, length(cmd)),
        |      i -> ascii(cmd[i])), (a, b) -> xor(a, b)) AS xr
        |  FROM cs)
        |SELECT l_orderkey, l_linenumber, out, inp,
        |  printf('{ABs,%03d,%03d}', out, inp) || chr(route_cs) AS frame,
        |  CAST(route_cs AS INT) AS route_cs,
        |  CAST(xor(xr, 51) & 127 AS INT) AS xor_cs
        |FROM cs2
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q13_chassis_decode" ->
      """WITH src AS (
        |  SELECT event_id,
        |    150 + (event_id * 7) % 300 AS t1,
        |    200 + (event_id * 13) % 250 AS t2,
        |    180 + (event_id * 3) % 220 AS t3,
        |    (event_id * 17) % 30000 AS f1,
        |    CASE WHEN event_id % 3 = 0 THEN 0 ELSE (event_id * 23) % 30000 END AS f2,
        |    (event_id * 29) % 30000 AS f3,
        |    (event_id * 31) % 30000 AS f4,
        |    (event_id * 37) % 30000 AS f5,
        |    CASE WHEN user_id % 2 = 0 THEN 'S' ELSE 'O' END AS door
        |  FROM events WHERE event_id % 20 = 0),
        |r AS (
        |  SELECT event_id, 1 AS rn, 'CPU Temperature' AS parameter, printf('%.1f°C', t1/10.0) AS value FROM src
        |  UNION ALL SELECT event_id, 2, 'PSU 1 Temperature', printf('%.1f°C', t2/10.0) FROM src
        |  UNION ALL SELECT event_id, 3, 'PSU 2 Temperature', printf('%.1f°C', t3/10.0) FROM src
        |  UNION ALL SELECT event_id, 4, 'Left Fan',   CASE WHEN f1 > 0 THEN printf('%d pulses/min', f1) ELSE 'Off' END FROM src
        |  UNION ALL SELECT event_id, 5, 'Rear Fan 1', CASE WHEN f2 > 0 THEN printf('%d pulses/min', f2) ELSE 'Off' END FROM src
        |  UNION ALL SELECT event_id, 6, 'Rear Fan 2', CASE WHEN f3 > 0 THEN printf('%d pulses/min', f3) ELSE 'Off' END FROM src
        |  UNION ALL SELECT event_id, 7, 'Rear Fan 3', CASE WHEN f4 > 0 THEN printf('%d pulses/min', f4) ELSE 'Off' END FROM src
        |  UNION ALL SELECT event_id, 8, 'Right Fan',  CASE WHEN f5 > 0 THEN printf('%d pulses/min', f5) ELSE 'Off' END FROM src
        |  UNION ALL SELECT event_id, 9, 'Rear Door',  CASE WHEN door = 'S' THEN 'Shut' ELSE 'Open' END FROM src)
        |SELECT event_id, CAST(rn AS INT) AS rn, parameter, value
        |FROM r ORDER BY event_id, rn""".stripMargin,
    "q14_range_dsl_parse" ->
      """WITH n AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation),
        |exp AS (
        |  SELECT k,
        |    printf('%d, %d-%d, x%d, %d-%d', k, k+2, k+5, k, k+12, k+9) AS dsl,
        |    list_concat(list_concat([CAST(k AS BIGINT)], generate_series(k+2, k+5)),
        |                generate_series(k+12, k+9, -1)) AS vals
        |  FROM n)
        |SELECT k AS n_nationkey, dsl,
        |  CAST(generate_subscripts(vals, 1) AS INT) AS pos,
        |  CAST(unnest(vals) AS INT) AS val
        |FROM exp ORDER BY n_nationkey, pos""".stripMargin,
    "q15_range_dsl_format" ->
      """WITH v AS (SELECT DISTINCT o_custkey, CAST(o_orderkey % 50 AS INT) AS v FROM orders),
        |i AS (SELECT o_custkey, v, v - row_number() OVER (PARTITION BY o_custkey ORDER BY v) AS isl FROM v),
        |s AS (
        |  SELECT o_custkey, isl, min(v) AS lo,
        |    CASE WHEN min(v) = max(v) THEN CAST(min(v) AS VARCHAR)
        |         ELSE CAST(min(v) AS VARCHAR) || '-' || CAST(max(v) AS VARCHAR) END AS seg
        |  FROM i GROUP BY o_custkey, isl)
        |SELECT o_custkey, string_agg(seg, ', ' ORDER BY lo) AS rle
        |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q16_colors" ->
      """WITH k AS (SELECT CAST(n_nationkey AS INT) AS key, n_name, CAST(n_nationkey AS INT) AS nk FROM nation),
        |hsl AS (SELECT nk, n_name,
        |    CAST((key*47) % 361 AS DOUBLE) AS h,
        |    CAST(40 + (key*13) % 26 AS DOUBLE) AS s,
        |    CAST(65 + (key*7) % 21 AS DOUBLE) AS l
        |  FROM k),
        |c1 AS (SELECT *, (1.0 - abs(2.0*l/100.0 - 1.0))*s/100.0 AS c FROM hsl),
        |c2 AS (SELECT *, c*(1.0 - abs(fmod(h/60.0, 2.0) - 1.0)) AS x, l/100.0 - c/2.0 AS m FROM c1),
        |rgb AS (SELECT nk, n_name,
        |    CAST(floor((CASE WHEN h<60 THEN c WHEN h<120 THEN x WHEN h<180 THEN 0 WHEN h<240 THEN 0 WHEN h<300 THEN x ELSE c END + m)*255) AS INT) AS r,
        |    CAST(floor((CASE WHEN h<60 THEN x WHEN h<120 THEN c WHEN h<180 THEN c WHEN h<240 THEN x WHEN h<300 THEN 0 ELSE 0 END + m)*255) AS INT) AS g,
        |    CAST(floor((CASE WHEN h<60 THEN 0 WHEN h<120 THEN 0 WHEN h<180 THEN x WHEN h<240 THEN c WHEN h<300 THEN c ELSE x END + m)*255) AS INT) AS b
        |  FROM c2)
        |SELECT nk AS n_nationkey, n_name,
        |  printf('#%02x%02x%02x', r, g, b) AS pastel,
        |  CASE WHEN (0.299*r + 0.587*g + 0.114*b)/255.0 > 0.5 THEN '#000000' ELSE '#ffffff' END AS contrast,
        |  printf('#%02x%02x%02x',
        |    greatest(0, least(255, CAST(floor(r * (1.0 + 20.0/100.0)) AS INT))),
        |    greatest(0, least(255, CAST(floor(g * (1.0 + 20.0/100.0)) AS INT))),
        |    greatest(0, least(255, CAST(floor(b * (1.0 + 20.0/100.0)) AS INT)))) AS brighter,
        |  printf('#%02x%02x%02x',
        |    greatest(0, least(255, CAST(floor(r * (1.0 + -20.0/100.0)) AS INT))),
        |    greatest(0, least(255, CAST(floor(g * (1.0 + -20.0/100.0)) AS INT))),
        |    greatest(0, least(255, CAST(floor(b * (1.0 + -20.0/100.0)) AS INT)))) AS darker
        |FROM rgb ORDER BY n_nationkey""".stripMargin,
    "q17_ip_valid" ->
      """WITH base AS (
        |  SELECT c_custkey,
        |    printf('%d.%d.%d.%d', c_custkey % 300, (c_nationkey*13) % 256,
        |           (c_custkey*7) % 300, c_custkey % 256) AS ip0
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN c_custkey % 11 = 0 THEN ip0 || '.9' ELSE ip0 END AS ip,
        |  (c_custkey % 11 <> 0 AND c_custkey % 300 <= 255 AND (c_custkey*7) % 300 <= 255) AS valid
        |FROM base ORDER BY c_custkey""".stripMargin,
    "q18_device_info" ->
      """SELECT p_partkey,
        |  CASE WHEN p_partkey % 10 = 0 THEN NULL
        |       ELSE p_brand || ' - FW' || CAST(p_partkey % 10 AS VARCHAR) || '.' || CAST(p_partkey % 7 AS VARCHAR) END AS device_info,
        |  CAST(8 + p_partkey % 9 AS INT) AS num_inputs,
        |  CAST(16 + p_partkey % 17 AS INT) AS num_outputs
        |FROM part ORDER BY p_partkey""".stripMargin,
  )
}
