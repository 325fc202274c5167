package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.Protocol

/** Fuzz the checksum Column implementations against reference-faithful
  * Scala models (etl_controller.py:387-418, 479-501) — the command-class
  * key CASE chain has seven branches worth randomized coverage beyond the
  * golden frames.
  */
class ChecksumPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Direct model of _calculate_checksum. */
  private def modelXor(command: String): Int = {
    var x = 0
    command.foreach(c => x ^= c.toInt)
    val content =
      if (command.startsWith("{") && command.endsWith("}")) command.drop(1).dropRight(1)
      else command
    val key =
      if (content.startsWith("ABc") && content.contains(",")) {
        if (content.split(",", -1).length >= 4) 0x33 else 0x78
      } else if (content.startsWith("*")) 0x48
      else if (content.startsWith("ABM")) 0x3d
      else if (content.startsWith("ABJ")) 0x47
      else if (content == "AB?") 0x46
      else if (content.startsWith("ABs,")) 0x06
      else 0
    (x ^ key) & 0x7f
  }

  /** Direct model of _calculate_route_checksum. */
  private def modelRoute(out: Int, inp: Int): Int = {
    val ds = (f"$out%03d" + f"$inp%03d").map(_ - '0').sum
    val v = 106 + ds
    if (v > 126) v - 95 else v
  }

  test("xor checksum matches the model on random commands (all key classes)") {
    val body = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '?', '*'))).map(_.mkString)
    val cmd = for {
      prefix <- Gen.oneOf("ABc", "ABcC,00,00", "ABcM,00,00,01", "*BI", "ABM?",
        "ABJ", "AB?", "ABs,001,002", "XYZ", "")
      b <- body
      braces <- Gen.oneOf(true, true, false)
    } yield if (braces) s"{$prefix$b}" else s"$prefix$b"
    val batch = (1 to 300).map(_ => cmd.sample.getOrElse("{AB?}")).distinct
    val got = batch.toDF("c").select(Protocol.xorChecksum(col("c"))).as[Int].collect().toSeq
    assert(got === batch.map(modelXor))
  }

  test("route checksum matches the model on the full 0..255 crosspoint grid sample") {
    val pairs = (for (o <- 0 to 255 by 7; i <- 0 to 255 by 13) yield (o, i)) ++
      Seq((1000, 5), (5, 1000), (12345, 999)) // %03d expands past 3 digits
    val got = pairs.toDF("o", "i")
      .select(Protocol.routeChecksum(col("o"), col("i"))).as[Int].collect().toSeq
    assert(got === pairs.map { case (o, i) => modelRoute(o, i) })
  }
}
