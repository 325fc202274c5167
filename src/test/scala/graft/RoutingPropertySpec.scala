package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.Routing

/** SURVEY §5.3: get_router_for_output inverts the offset union —
  * property-tested against a direct model of the reference algorithm
  * (etl_controller.py:248-284) including the zero-router skip and the
  * overflow clamp that ignores the last router's capacity.
  */
class RoutingPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Direct model of get_router_for_output. */
  private def model(output: Int, primary: Int, additional: Seq[Int],
      combine: Boolean): (Int, Int) = {
    if (!combine || additional.isEmpty) return (0, output)
    val primaryOutputs = if (primary != 0) primary else 16 // `or 16` fallback
    if (output <= primaryOutputs) return (0, output)
    var running = primaryOutputs
    additional.zipWithIndex.foreach { case (n, i) =>
      if (n != 0) {
        if (output <= running + n) return (i + 1, output - running)
        running += n
      }
    }
    val lastOffset = primaryOutputs + additional.dropRight(1).sum
    (additional.length, output - lastOffset)
  }

  test("resolution matches the reference model, incl. overflow clamp") {
    val cfg = for {
      primary <- Gen.choose(1, 20) // nonzero: the op takes resolved capacity
      nAdd <- Gen.choose(0, 4)
      additional <- Gen.listOfN(nAdd, Gen.choose(0, 8))
      combine <- Gen.oneOf(true, true, false)
    } yield (primary, additional, combine)
    (1 to 40).foreach { _ =>
      val (primary, additional, combine) = cfg.sample.get
      val total = primary + additional.sum
      val outputs = (1 to total + 5).toDF("output") // +5 exercises overflow
      val got = Routing.resolveOutputs(outputs, primary, additional, combine)
        .orderBy("output").as[(Int, Int, Int)].collect().toSeq
      val want = (1 to total + 5).map { o =>
        val (r, l) = model(o, primary, additional, combine)
        (o, r, l)
      }
      assert(got === want, s"primary=$primary additional=$additional combine=$combine")
    }
  }

  test("round trip: resolution inverts the multi-router union offsets (OP-27/OP-28)") {
    val primary = 6
    val additional = Seq(4, 0, 5)
    val offsets = Seq(0, 6, -1, 10) // router_idx -> global offset (skip zero router)
    // forward (OP-27): local outputs per router → combined outputs
    val combined = for {
      (n, i) <- (primary +: additional).zipWithIndex if n > 0
      local <- 1 to n
    } yield (i, local, offsets(i) + local)
    val got = Routing.resolveOutputs(
      combined.map(_._3).toDF("output"), primary, additional, combineRouters = true)
      .orderBy("output").as[(Int, Int, Int)].collect().toSeq
    // inverse (OP-28) must land every combined output back on its router
    assert(got === combined.sortBy(_._3).map { case (r, l, o) => (o, r, l) })
  }
}
