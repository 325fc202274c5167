package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.RangeDsl

/** ScalaCheck properties for the range DSL (SURVEY.md §5.3).
  * Oracle: a direct Scala port of the reference algorithms
  * (etl_controller.py:73-125) — property-tested against the Column
  * implementation on random inputs.
  */
class RangeDslPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Reference-faithful model of format_range_string. */
  private def modelFormat(numbers: Seq[Int]): String = {
    if (numbers.isEmpty) return ""
    val ranges = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < numbers.length) {
      val start = numbers(i)
      var end = start
      while (i + 1 < numbers.length && numbers(i + 1) == end + 1) { i += 1; end = numbers(i) }
      ranges += (if (start == end) start.toString else s"$start-$end")
      i += 1
    }
    ranges.mkString(", ")
  }

  /** Reference-faithful model of parse_range_string. */
  private def modelParse(s: String): Seq[Int] =
    s.trim match {
      case "" => Seq.empty
      case str => str.split(",", -1).toSeq.flatMap { part0 =>
        val part = part0.trim
        if (part.contains('-')) {
          val Array(a, b) = part.split("-", 2)
          (for { s <- a.trim.toIntOption; e <- b.trim.toIntOption } yield
            if (s <= e) (s to e).toSeq else (s to e by -1).toSeq).getOrElse(Seq.empty)
        } else part.toIntOption.toSeq
      }
    }

  private def sparkFormat(batch: Seq[Seq[Int]]): Seq[String] =
    batch.toDF("a").select(RangeDsl.formatRangeDsl(col("a"))).as[String].collect().toSeq

  private def sparkParse(batch: Seq[String]): Seq[Seq[Int]] =
    batch.toDF("s").select(RangeDsl.parseRangeDsl(col("s"))).as[Seq[Int]].collect().toSeq

  private val intList = Gen.listOf(Gen.chooseNum(0, 40))

  test("format matches the reference model on random lists (batched)") {
    val batch = (1 to 200).map(_ => intList.sample.getOrElse(Nil).toSeq)
    assert(sparkFormat(batch) === batch.map(modelFormat))
  }

  test("parse(format(xs)) == xs round trip") {
    val batch = (1 to 200).map(_ => intList.sample.getOrElse(Nil).toSeq)
    val formatted = batch.map(modelFormat)
    assert(sparkParse(formatted) === batch)
  }

  test("parse matches the reference model on messy strings") {
    val partGen = Gen.oneOf(
      Gen.chooseNum(0, 99).map(_.toString),
      for { a <- Gen.chooseNum(0, 99); b <- Gen.chooseNum(0, 99) } yield s"$a-$b",
      Gen.oneOf("bogus", "", " ", "x1", "3-", "-5"))
    val strGen = Gen.listOf(partGen).map(_.mkString(","))
    val batch = (1 to 200).map(_ => strGen.sample.getOrElse(""))
    assert(sparkParse(batch) === batch.map(modelParse))
  }
}
