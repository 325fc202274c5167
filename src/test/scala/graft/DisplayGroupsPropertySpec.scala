package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.Grouping

/** Property test of the windowed display-groups formulation against a
  * reference-faithful model (direct re-statement of get_display_groups,
  * etl_controller.py:286-330) — SURVEY.md §7.4 risk 4: run fusing is on
  * (name, color) equality and reordered display lists split groups.
  */
class DisplayGroupsPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  case class G(name: String, color: String, outputs: List[Int])

  /** Reference-faithful model: walk the display list in order, fuse
    * contiguous same-(name,color) runs, singletons for uncovered.
    */
  private def model(outputsToShow: List[Int], groups: List[G]): List[(String, String, List[Int])] = {
    val outputsSet = outputsToShow.toSet
    val groupMap = scala.collection.mutable.Map.empty[Int, G]
    for (g <- groups; o <- g.outputs if outputsSet.contains(o))
      groupMap(o) = g // LAST group wins (reference overwrites, py:295-297)
    val result = scala.collection.mutable.ListBuffer.empty[(String, String, List[Int])]
    var current: Option[G] = None
    var currentOutputs = List.empty[Int]
    for (out <- outputsToShow) {
      groupMap.get(out) match {
        case Some(g) =>
          if (current.exists(c => c.name == g.name && c.color == g.color))
            currentOutputs = currentOutputs :+ out
          else {
            current.foreach(c => if (currentOutputs.nonEmpty)
              result += ((c.name, c.color, currentOutputs)))
            current = Some(g)
            currentOutputs = List(out)
          }
        case None =>
          current.foreach(c => if (currentOutputs.nonEmpty)
            result += ((c.name, c.color, currentOutputs)))
          current = None
          currentOutputs = Nil
          result += ((s"Out $out", Grouping.UncoveredColor, List(out)))
      }
    }
    current.foreach(c => if (currentOutputs.nonEmpty)
      result += ((c.name, c.color, currentOutputs)))
    result.toList
  }

  private val genCase: Gen[(List[Int], List[G])] = for {
    nOut <- Gen.choose(0, 20)
    outputs <- Gen.pick(nOut, 1 to 24).map(_.toList)
    shuffled <- Gen.const(scala.util.Random.shuffle(outputs))
    nGroups <- Gen.choose(0, 5)
    groups <- Gen.listOfN(nGroups, for {
      name <- Gen.oneOf("TX", "RX", "AUX")
      color <- Gen.oneOf("#aaa", "#bbb")
      members <- Gen.someOf(1 to 24).map(_.toList)
    } yield G(name, color, members))
  } yield (shuffled, groups)

  test("windowed formulation matches the reference model on random configs") {
    val cases = (1 to 60).flatMap(_ => genCase.sample)
    // run all cases through ONE Spark job, keyed by session id
    val displayRows = cases.zipWithIndex.flatMap { case ((outs, _), sid) =>
      outs.zipWithIndex.map { case (o, pos) => (sid, pos, o) }
    }
    val mapRows = cases.zipWithIndex.flatMap { case ((outs, groups), sid) =>
      val outputsSet = outs.toSet
      val resolved = scala.collection.mutable.Map.empty[Int, G]
      for (g <- groups; o <- g.outputs if outputsSet.contains(o))
        resolved(o) = g // last wins, matching the reference
      resolved.toSeq.map { case (o, g) => (sid, o, g.name, g.color) }
    }
    // per-session group maps joined via composite key: fold session into
    // the output key to keep the op's (output -> group) contract
    val display = displayRows.toDF("session", "pos", "o")
      .selectExpr("session", "pos", "session * 1000 + o AS output")
    val groupMap = mapRows.toDF("session", "o", "name", "color")
      .selectExpr("session * 1000 + o AS output", "name", "color")
    val got = Grouping.displayGroups(display, groupMap)
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(r =>
        (r.getString(2), r.getString(3),
          r.getString(4).split(",").filter(_.nonEmpty).map(_.toInt % 1000).toList)).toList)
      .toMap
    cases.zipWithIndex.foreach { case ((outs, groups), sid) =>
      val expect = model(outs, groups).map { case (n, c, os) =>
        // singleton names embed the composite key in the op's output
        (if (n.startsWith("Out ")) s"Out ${sid * 1000 + n.drop(4).toInt}" else n, c, os)
      }
      val actual = got.getOrElse(sid, Nil)
      assert(actual === expect, s"case $sid: outs=$outs groups=$groups")
    }
  }
}
