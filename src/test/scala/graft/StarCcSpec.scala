package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness guard for the large-star/small-star CC rival: labels
  * must equal the production min-label propagation's (= component
  * minima) on the real pair graphs and on adversarial synthetic shapes
  * (a long path — the diameter worst case; a clique — the replica
  * worst case; id-REVERSED orientation — the monotonicity trap).
  */
class StarCcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def starOf(pairs: org.apache.spark.sql.DataFrame) =
    graft.ops.Dedup.fromPairsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def minLabelOf(pairs: org.apache.spark.sql.DataFrame) =
    graft.ops.Dedup.fromPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star CC equals min-label CC on the real near-dup pair graphs") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val pairs = graft.queries.TextQueries.dupPairs(spark, d).persist()
      assert(starOf(pairs) === minLabelOf(pairs), d)
      pairs.unpersist(false)
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
      graft.ops.TowerMemo.clear()
    }
  }

  test("star CC on adversarial shapes: path, clique, reversed ids") {
    // path 0-1-2-...-40 (diameter 40), ids ascending
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("da", "db")
    assert(starOf(path) === (0L to 40L).map(_ -> 0L).toMap)
    // same path with the orientation reversed (larger id first)
    val rev = (0L until 40L).map(i => (i + 1, i)).toDF("da", "db")
    assert(starOf(rev) === (0L to 40L).map(_ -> 0L).toMap)
    // clique over ids 100..119 plus a disjoint pair
    val clique = (for {
      a <- 100L until 120L; b <- (a + 1) until 120L
    } yield (a, b)).toDF("da", "db")
      .union(Seq((500L, 501L)).toDF("da", "db"))
    val expect = (100L until 120L).map(_ -> 100L).toMap ++
      Map(500L -> 500L, 501L -> 500L)
    assert(starOf(clique) === expect)
  }
}
