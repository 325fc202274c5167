package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ETL Vortex wire-protocol scalar operators as pure Column combinators
  * (codegen'd built-ins only — no UDFs).
  *
  * Behavior derived from the reference (cited file:line into
  * /root/reference/); frames verified against the golden vectors in
  * FIXTURES.md §B.
  */
object Protocol {

  /** Fold XOR over the ASCII bytes of a string column. */
  private def xorBytes(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(substring(s, i))),
      lit(0),
      (acc, x) => acc.bitwiseXOR(x))

  // substring with a Column position (the functions._ overload wants Ints)
  private def substring(s: Column, pos: Column): Column = s.substr(pos, lit(1))

  /** ASCII code → 1-char string (SQL `char`; no Scala-API equivalent). */
  def chr(code: Column): Column = call_function("char", code)

  /** OP-13 — generic command checksum (etl_controller.py:387-418):
    * XOR of all bytes, XOR a command-class key, masked to 0x7F.
    */
  def xorChecksum(command: Column): Column = {
    val xorAll = xorBytes(command)
    val inner = when(
      command.startsWith("{") && command.endsWith("}"),
      command.substr(lit(2), length(command) - 2)).otherwise(command)
    val nParts = size(split(inner, ","))
    val key = when(inner.startsWith("ABc") && inner.contains(","),
        when(nParts >= 4, lit(0x33)).otherwise(lit(0x78)))
      .when(inner.startsWith("*"), lit(0x48))
      .when(inner.startsWith("ABM"), lit(0x3d))
      .when(inner.startsWith("ABJ"), lit(0x47))
      .when(inner === "AB?", lit(0x46))
      .when(inner.startsWith("ABs,"), lit(0x06))
      .otherwise(lit(0))
    xorAll.bitwiseXOR(key).bitwiseAND(lit(0x7f))
  }

  /** OP-13 checksum as the appended character. */
  def xorChecksumChar(command: Column): Column = chr(xorChecksum(command))

  /** OP-14 — route-command checksum (etl_controller.py:479-501): digit sum
    * of zero-padded OOO+III, +106, wrap >126 by −95. Returns the ASCII code.
    */
  def routeChecksum(outputNum: Column, inputNum: Column): Column = {
    // format_string("%03d") expands beyond 3 digits for values ≥ 1000,
    // exactly like the reference's f"{n:03d}" (lpad would truncate)
    val s = concat(format_string("%03d", outputNum), format_string("%03d", inputNum))
    val digitSum = aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))) - lit(48)),
      lit(0), (acc, x) => acc + x)
    val v = lit(106) + digitSum
    when(v > 126, v - 95).otherwise(v)
  }

  /** OP-14/OP-5 — full route command frame `{ABs,OOO,III}` + checksum char
    * (output first; etl_controller.py:503-552, FIXTURES.md §B.1).
    */
  def routeFrame(outputNum: Column, inputNum: Column): Column =
    concat(
      lit("{ABs,"), format_string("%03d", outputNum),
      lit(","), format_string("%03d", inputNum), lit("}"),
      chr(routeChecksum(outputNum, inputNum)))

  /** Query frame builder: wraps a bare command in braces and appends the
    * generic checksum (`{AB?}` → `{AB?}|`).
    */
  def commandFrame(bareCommand: Column): Column = {
    val framed = concat(lit("{"), bareCommand, lit("}"))
    concat(framed, xorChecksumChar(framed))
  }

  /** OP-7 — STATUS decode (etl_controller.py:615-623): `{BASTATUS,a,b,…}`
    * → array<struct<output int, input int>>; 1-based positional outputs,
    * non-digit parts skipped. Digit parts whose value exceeds
    * Int.MaxValue are dropped like non-digit parts (shifting nothing —
    * outputs stay positional), matching
    * [[graft.functions.StatusDecode]]; the ≤18-digit bound keeps the
    * long cast safe under ANSI before the value check runs.
    */
  def statusRoutes(raw: Column): Column = {
    val payload = regexp_extract(raw, "\\{BASTATUS,([^}]+)\\}", 1)
    val indexed = transform(split(payload, ","),
      (p, i) => struct((i + 1).as("output"), p.as("p")))
    val digits = filter(indexed, s => s.getField("p").rlike("^[0-9]{1,18}$") &&
      s.getField("p").cast("long") <= Int.MaxValue)
    transform(digits, s => struct(
      s.getField("output").cast("int").as("output"),
      s.getField("p").cast("int").as("input")))
  }

  /** OP-8 — device-info decode (etl_controller.py:463-469):
    * `{BBI,model,info}` → "model - info", null when the frame doesn't parse.
    */
  def deviceInfo(raw: Column): Column = {
    val model = regexp_extract(raw, "\\{BBI,([^,]+),([^}]+)\\}", 1)
    val info  = regexp_extract(raw, "\\{BBI,([^,]+),([^}]+)\\}", 2)
    when(model =!= "" && info =!= "", concat(model, lit(" - "), info))
  }

  /** OP-9 — matrix-size decode (etl_controller.py:471-477): `{BAM?,ni,no…}`
    * → struct<num_inputs int, num_outputs int>, null when unparseable.
    */
  def matrixSize(raw: Column): Column = {
    val ni = regexp_extract(raw, "\\{BAM\\?,(\\d+),(\\d+)", 1)
    val no = regexp_extract(raw, "\\{BAM\\?,(\\d+),(\\d+)", 2)
    when(ni =!= "" && no =!= "",
      struct(ni.cast("int").as("num_inputs"), no.cast("int").as("num_outputs")))
  }

  /** OP-10 — chassis telemetry decode (etl_controller.py:741-795):
    * `{BAcC,n,n,CONTENT}` → array<struct<parameter string, value string>>
    * in the reference's row order: ≤3 temperatures (`[+-]ddd` before an O,
    * ÷10 → "x.x°C"; the sign is dropped, faithfully), ≤5 fans (5-digit
    * pulse counts after the `OOO` marker; 0 → "Off"), then the rear-door
    * flag (content[1] == 'S' → Shut).
    */
  def chassisRows(raw: Column): Column =
    // content is referenced ~8 times below; bind it once per row (HOF
    // bodies are interpreted with no CSE — see TextOps.bindOnce)
    TextOps.bindOnce(regexp_extract(raw, "\\{BAcC,\\d+,\\d+,([^}]+)\\}", 1))(chassisRowsFromContent)

  private def chassisRowsFromContent(content: Column): Column = {
    val tempNames = array(lit("CPU Temperature"), lit("PSU 1 Temperature"), lit("PSU 2 Temperature"))
    val temps = slice(regexp_extract_all(content, lit("[+\\-](\\d{3})(?=O)"), lit(1)), 1, 3)
    val tempRows = transform(temps, (t, i) => struct(
      element_at(tempNames, i + 1).as("parameter"),
      format_string("%.1f°C", t.cast("int") / lit(10.0)).as("value")))
    val fanNames = array(lit("Left Fan"), lit("Rear Fan 1"), lit("Rear Fan 2"),
      lit("Rear Fan 3"), lit("Right Fan"))
    val fanSection = regexp_extract(content, "OOO(.+)$", 1)
    val fans = slice(regexp_extract_all(fanSection, lit("(\\d{5})O"), lit(1)), 1, 5)
    val fanRows = transform(fans, (f, i) => struct(
      element_at(fanNames, i + 1).as("parameter"),
      when(f.cast("int") > 0, concat(f.cast("int").cast("string"), lit(" pulses/min")))
        .otherwise(lit("Off")).as("value")))
    val doorRows = when(length(content) >= 3,
      array(struct(lit("Rear Door").as("parameter"),
        when(content.substr(lit(2), lit(1)) === "S", lit("Shut"))
          .otherwise(lit("Open")).as("value"))))
      .otherwise(array().cast("array<struct<parameter:string,value:string>>"))
    when(content === "", array().cast("array<struct<parameter:string,value:string>>"))
      .otherwise(concat(tempRows, fanRows, doorRows))
  }
}
