package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ops.AsOf

/** Custom as-of join (LogicalPlan + Strategy + Exec) vs the built-in
  * window formulation on random data — plus plan shape and edge cases.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Built-in oracle: union trick + last-value window. */
  private def windowTwin(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = {
    // per left row: newest right (key, rt <= lt)
    left.flatMap { case (id, k, lt) =>
      right.filter { case (rk, rt, _) => rk == k && rt <= lt }
        .sortBy(_._2).lastOption.map { case (_, _, v) => (id, k, v) }
    }
  }

  test("as-of join matches the model on random data across partitions") {
    val gen = for {
      nl <- Gen.choose(0, 120)
      nr <- Gen.choose(0, 60)
      lRows <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 6L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rRows <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 6L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
    } yield (lRows.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      // unique (key, time) on the right: last wins pre-aggregation
      rRows.distinct.map { case (k, t) => (k, t, k * 1000.0 + t) })
    (1 to 25).foreach { _ =>
      val (l, r) = gen.sample.get
      val lDf = l.toDF("event_id", "k", "lt").repartition(5)
      val rDf = r.toDF("rk", "rt", "v").repartition(3)
      val got = AsOf.asofJoin(lDf, rDf, "k", "lt", "rk", "rt")
        .select(col("event_id"), col("k"), col("v"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val want = windowTwin(l, r).sortBy(_._1)
      assert(got === want, s"left=$l right=$r")
    }
  }

  test("physical plan uses AsOfJoinExec with clustered+sorted children") {
    val lDf = Seq((1L, 1L, 10L)).toDF("event_id", "k", "lt")
    val rDf = Seq((1L, 5L, 2.0)).toDF("rk", "rt", "v")
    val df = AsOf.asofJoin(lDf, rDf, "k", "lt", "rk", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)  // exec node renders without the Exec suffix
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort [k"), plan)
    assert(df.as[(Long, Long, Long, Long, Long, Double)].collect().toSeq ===
      Seq((1L, 1L, 10L, 1L, 5L, 2.0)))
  }

  test("left rows before any snapshot drop out (inner as-of)") {
    val lDf = Seq((1L, 1L, 3L), (2L, 1L, 7L)).toDF("event_id", "k", "lt")
    val rDf = Seq((1L, 5L, 9.0)).toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(lDf, rDf, "k", "lt", "rk", "rt")
      .select("event_id", "v").as[(Long, Double)].collect().toSeq
    assert(got === Seq((2L, 9.0))) // event at t=3 has no snapshot ≤ 3
  }

  test("null keys and null times never match (DuckDB ASOF semantics)") {
    val lDf = Seq(
      (1L, Some(1L), Some(10L)), // normal match
      (2L, None, Some(10L)),     // null key: emits nothing
      (3L, Some(1L), None),      // null time: emits nothing (would NPE before)
      (4L, None, None))
      .toDF("event_id", "k", "lt")
    val rDf = Seq(
      (Some(1L), Some(5L), 1.0),  // the only holdable snapshot
      (Option.empty[Long], Some(2L), 2.0), // null key: never held
      (Some(1L), Option.empty[Long], 3.0)) // null time: never held
      .toDF("rk", "rt", "v")
    val got = AsOf.asofJoin(lDf, rDf, "k", "lt", "rk", "rt")
      .select("event_id", "v").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.0)))
  }
}
