package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q108 (leakage-free group split): the
  * zero-straddle guarantee checked against the DEPLOYED detector's own
  * verified pair list (q51), not a reimplementation — every verified
  * near-dup pair must land in one split — plus the binding checks: the
  * group split must actually move docs vs the naive doc-hash split,
  * and all three splits must be populated.
  */
class GroupSplitSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q108: no verified near-dup pair straddles splits; the regrouping binds") {
    val assign = SparkEntry.queries("q108_group_split")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(4))).toMap
    queries.releasePersisted()
    spark.catalog.clearCache()
    val pairs = SparkEntry.queries("q51_simhash64")(spark, d)
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    assert(pairs.nonEmpty, "no verified near-dup pairs — vacuous")
    val straddling = pairs.filter { case (a, b) => assign(a)._1 != assign(b)._1 }
    assert(straddling.isEmpty,
      s"near-dup pairs straddle splits: ${straddling.take(5).mkString(", ")}")
    assert(assign.values.count(_._2 == 1) > 0,
      "group split never moves a doc vs the naive split — vacuous")
    val sizes = assign.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(Set("train", "val", "test").subsetOf(sizes.keySet),
      s"empty split: $sizes")
    // naive doc-hash split must actually leak on this corpus (else the
    // operator solves a non-problem here)
    val naive = pairs.count { case (a, b) =>
      val h = (id: Long) => (id * 1103515245L + 12345L) % 2147483647L
      def s(id: Long) = {
        val v = h(id)
        if (v < graft.queries.TextQueries.SplitTrainMax) "train"
        else if (v < graft.queries.TextQueries.SplitValMax) "val" else "test"
      }
      s(a) != s(b)
    }
    assert(naive > 0, "naive split never leaks at sf0.001 — weak evidence")
  }
}
