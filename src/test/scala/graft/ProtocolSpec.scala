package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Colors, Protocol, RangeDsl}

/** Golden-vector specs for the protocol/scalar operator layer
  * (FIXTURES.md §B; vectors derived by executing the reference algorithms,
  * etl_controller.py:387-418, 479-501, 615-623, 741-795).
  */
class ProtocolSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def one[T](df: DataFrame): T =
    df.collect().head.getAs[T](0)

  private def evalStr(c: org.apache.spark.sql.Column): String =
    one[String](Seq(1).toDF("x").select(c))

  test("route frames match packet-capture goldens") {
    val df = Seq((2, 5), (64, 12), (99, 99)).toDF("out", "inp")
      .select(Protocol.routeFrame(col("out"), col("inp")))
    assert(df.as[String].collect().toSeq ===
      Seq("{ABs,002,005}q", "{ABs,064,012}w", "{ABs,099,099}/"))
  }

  test("command frames carry the per-class XOR checksum") {
    val cases = Seq(
      "AB?" -> "{AB?}|",
      "*BI" -> "{*BI}o",
      "ABM?" -> "{ABM?}J",
      "ABcC,00,00" -> "{ABcC,00,00}]",
      "ABcM,00,00,01" -> "{ABcM,00,00,01}5",
      "ABcI,00,00,02" -> "{ABcI,00,00,02}2")
    val got = cases.map(_._1).toDF("cmd")
      .select(Protocol.commandFrame(col("cmd"))).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("STATUS decode skips non-digit parts, 1-based positional outputs") {
    val df = Seq("{BASTATUS,5,3,2,1,7,x,8,4}").toDF("raw")
      .select(explode(Protocol.statusRoutes(col("raw"))).as("r"))
      .select($"r.output", $"r.input")
    assert(df.as[(Int, Int)].collect().toSeq ===
      Seq(1 -> 5, 2 -> 3, 3 -> 2, 4 -> 1, 5 -> 7, 7 -> 8, 8 -> 4))
  }

  test("device info / matrix size decode") {
    assert(evalStr(Protocol.deviceInfo(lit("{BBI,Vortex64,FW2.1}"))) === "Vortex64 - FW2.1")
    assert(one[Row](Seq(1).toDF("x")
      .select(Protocol.matrixSize(lit("{BAM?,16,16}")))) === Row(16, 16))
    assert(Seq(1).toDF("x").select(Protocol.deviceInfo(lit("{GARBAGE}")))
      .collect().head.isNullAt(0))
  }

  test("chassis decode matches the worked example (etl_controller.py:746)") {
    val raw = "{BAcC,00,00,OSO+320O+300O+291OOO20460O06060O06150O06150O22485O}"
    val rows = Seq(raw).toDF("raw")
      .select(explode(Protocol.chassisRows(col("raw"))).as("r"))
      .select($"r.parameter", $"r.value").as[(String, String)].collect().toSeq
    assert(rows === Seq(
      "CPU Temperature" -> "32.0°C",
      "PSU 1 Temperature" -> "30.0°C",
      "PSU 2 Temperature" -> "29.1°C",
      "Left Fan" -> "20460 pulses/min",
      "Rear Fan 1" -> "6060 pulses/min",
      "Rear Fan 2" -> "6150 pulses/min",
      "Rear Fan 3" -> "6150 pulses/min",
      "Right Fan" -> "22485 pulses/min",
      "Rear Door" -> "Shut"))
  }

  test("chassis decode reports a zero fan as Off and an open door") {
    val raw = "{BAcC,00,00,OOO+100OOO00000O11111O}"
    val rows = Seq(raw).toDF("raw")
      .select(explode(Protocol.chassisRows(col("raw"))).as("r"))
      .select($"r.parameter", $"r.value").as[(String, String)].collect().toSeq
    assert(rows.contains("Left Fan" -> "Off"))
    assert(rows.contains("Rear Fan 1" -> "11111 pulses/min"))
    assert(rows.last === ("Rear Door" -> "Open"))
  }

  test("range DSL parse vectors (FIXTURES.md §B.4)") {
    def parse(s: String): Seq[Int] =
      Seq(s).toDF("s").select(RangeDsl.parseRangeDsl(col("s")))
        .as[Seq[Int]].collect().head
    assert(parse("1-16") === (1 to 16))
    assert(parse("1,3,5-10") === Seq(1, 3, 5, 6, 7, 8, 9, 10))
    assert(parse("1-5,11-20,6-10") === ((1 to 5) ++ (11 to 20) ++ (6 to 10)))
    assert(parse("20-15") === Seq(20, 19, 18, 17, 16, 15))
    assert(parse("bogus, 7") === Seq(7))
    assert(parse("") === Seq())
  }

  test("range DSL format collapses ascending runs only, preserving order") {
    def fmt(xs: Seq[Int]): String =
      Seq(xs).toDF("a").select(RangeDsl.formatRangeDsl(col("a")))
        .as[String].collect().head
    assert(fmt(Seq(1, 2, 3, 7)) === "1-3, 7")
    assert(fmt(Seq(20, 19, 18)) === "20, 19, 18")
    assert(fmt(Seq(1, 2, 3, 7, 9, 10, 11, 12)) === "1-3, 7, 9-12")
    assert(fmt(Seq(5)) === "5")
    assert(fmt(Seq()) === "")
  }

  test("contrast + luminance shift match reference arithmetic") {
    assert(evalStr(Colors.contrastColor(lit("#ffffff"))) === "#000000")
    assert(evalStr(Colors.contrastColor(lit("#000000"))) === "#ffffff")
    // 0.299*131/255 etc — threshold case away from boundary
    assert(evalStr(Colors.contrastColor(lit("#83f600"))) === "#000000")
    assert(evalStr(Colors.adjustLuminance(lit("#804020"), lit(20))) === "#994c26")
    assert(evalStr(Colors.adjustLuminance(lit("#804020"), lit(-20))) === "#663319")
    assert(evalStr(Colors.adjustLuminance(lit("#ffffff"), lit(20))) === "#ffffff")
  }

  test("pastel color matches a direct port of the reference HSL->RGB math") {
    // reference: etl_controller.py:127-143 with hash-seeded h/s/l
    def modelPastel(key: Int): String = {
      val h = (key * 47 % 361).toDouble
      val s = (40 + key * 13 % 26).toDouble
      val l = (65 + key * 7 % 21).toDouble
      val c = (1 - math.abs(2 * l / 100 - 1)) * s / 100
      val x = c * (1 - math.abs((h / 60) % 2 - 1))
      val m = l / 100 - c / 2
      val (r, g, b) =
        if (h < 60) (c, x, 0.0) else if (h < 120) (x, c, 0.0)
        else if (h < 180) (0.0, c, x) else if (h < 240) (0.0, x, c)
        else if (h < 300) (x, 0.0, c) else (c, 0.0, x)
      f"#${((r + m) * 255).toInt}%02x${((g + m) * 255).toInt}%02x${((b + m) * 255).toInt}%02x"
    }
    val keys = 0 to 100
    val got = keys.toDF("k").select(Colors.pastelColor(col("k"))).as[String].collect().toSeq
    assert(got === keys.map(modelPastel))
  }

  test("IP validation") {
    val cases = Seq(
      "192.168.1.100" -> true,
      "255.255.255.255" -> true,
      "256.1.1.1" -> false,
      "1.2.3" -> false,
      "1.2.3.4.5" -> false,
      "a.b.c.d" -> false)
    val got = cases.map(_._1).toDF("ip")
      .select(Colors.isValidIp(col("ip"))).as[Boolean].collect().toSeq
    assert(got === cases.map(_._2))
  }
}
