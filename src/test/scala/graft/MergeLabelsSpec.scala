package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The incremental CC maintenance contract (q146's operator): for ANY
  * wave split, `mergeLabels(cc(old), delta)` must equal the
  * from-scratch labeling of the union graph — including waves that
  * merge old components, waves introducing brand-new vertices, waves
  * internal to one component (no-op path), and a ROLLING sequence of
  * waves where each merge's output seeds the next. The oracled q146
  * proves one real split against DuckDB; this spec covers the rest of
  * the split space on synthetic graphs plus real-data non-vacuity.
  */
class MergeLabelsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap

  private def pairsDf(ps: Seq[(Long, Long)]) = ps.toDF("da", "db")

  test("merge == recompute across synthetic wave shapes") {
    // components before: {0,1,2}, {10,11}, {20}, singleton-free {30,31}
    val oldPairs = Seq((0L, 1L), (1L, 2L), (10L, 11L), (30L, 31L))
    val old = Dedup.fromPairs(pairsDf(oldPairs).persist())

    // wave exercising every branch at once:
    //  - merges two old components        (2, 10)
    //  - attaches a brand-new vertex      (11, 40)
    //  - a pair internal to one component (0, 2) — must be a no-op
    //  - a pair of two brand-new vertices (50, 51)
    val delta = Seq((2L, 10L), (11L, 40L), (0L, 2L), (50L, 51L))
    val merged = labels(Dedup.mergeLabels(old, pairsDf(delta).persist()))
    val scratch = labels(Dedup.fromPairs(pairsDf(oldPairs ++ delta).persist()))
    assert(merged == scratch)
    // the merged family collapsed to the global min
    assert(merged(40L) == 0L && merged(10L) == 0L && merged(11L) == 0L)
    // untouched component kept its label
    assert(merged(30L) == 30L && merged(31L) == 30L)
    // fresh disconnected pair labeled by its own min
    assert(merged(50L) == 50L && merged(51L) == 50L)
  }

  test("rolling waves: each merge seeds the next, fixpoint equals full recompute") {
    // a path graph delivered one edge per wave in DESCENDING id order —
    // every wave relabels the entire so-far component (worst case)
    val edges = (0 until 8).map(i => (i.toLong, i.toLong + 1)).reverse
    var lbl = Dedup.fromPairs(pairsDf(Seq(edges.head)).persist())
    for (e <- edges.tail) {
      lbl = Dedup.mergeLabels(lbl, pairsDf(Seq(e)).persist()).localCheckpoint(true)
    }
    val scratch = labels(Dedup.fromPairs(pairsDf(edges).persist()))
    assert(labels(lbl) == scratch)
    assert(scratch.values.toSet == Set(0L), "path graph must collapse to min 0")
  }

  test("delete == recompute-on-live across synthetic deletion shapes") {
    // components: a 5-path 0-1-2-3-4 (2 is a bridge), {10,11,12} in a
    // triangle (no bridge), {20,21}, {30,31}
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L), (30L, 31L))
    val pdf = pairsDf(pairs).persist()
    val old = Dedup.fromPairs(pdf).localCheckpoint(true)

    // one wave exercising every deletion branch at once:
    //  - 2 is a BRIDGE: the path splits into {0,1} and {3,4}
    //  - 10 is the triangle's MIN: survivors stay connected, relabel to 11
    //  - 20 kills its pair: 21 becomes pairless and must DROP
    //  - 99 was never labeled: a no-op
    val dels = Seq(2L, 10L, 20L, 99L).toDF("id")
    val got = labels(Dedup.deleteLabels(old, pdf, dels))
    val livePairs = pairs.filterNot { case (a, b) =>
      Set(2L, 10L, 20L).contains(a) || Set(2L, 10L, 20L).contains(b) }
    val scratch = labels(Dedup.fromPairs(pairsDf(livePairs).persist()))
    assert(got == scratch)
    assert(got(0L) == 0L && got(1L) == 0L, "left split half mislabeled")
    assert(got(3L) == 3L && got(4L) == 3L, "right split half not relabeled to its new min")
    assert(got(11L) == 11L && got(12L) == 11L, "min-deletion did not advance the label")
    assert(!got.contains(21L), "pairless survivor kept a stale label row")
    assert(got(30L) == 30L && got(31L) == 30L, "untouched component disturbed")
    assert(!got.keySet.exists(Set(2L, 10L, 20L, 99L)), "a deleted id survived")
  }

  test("delete then merge composes: re-adding a bridge restores the recompute labels") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val pdf = pairsDf(pairs).persist()
    val old = Dedup.fromPairs(pdf).localCheckpoint(true)
    val afterDel = Dedup.deleteLabels(old, pdf, Seq(2L).toDF("id")).localCheckpoint(true)
    // a later wave bridges the split halves directly (1, 3) — the
    // merge must run correctly FROM a post-delete labeling
    val rejoin = Dedup.mergeLabels(afterDel, pairsDf(Seq((1L, 3L))).persist())
    val scratch = labels(Dedup.fromPairs(
      pairsDf(Seq((0L, 1L), (3L, 4L), (1L, 3L))).persist()))
    assert(labels(rejoin) == scratch)
    assert(scratch.values.toSet == Set(0L))
  }

  test("real corpus split: merge == recompute, and the wave genuinely relabels") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q146_cc_merge")(spark, d).collect()
    assert(out.nonEmpty)
    // merge law re-checked in-process (the oracle checks it vs DuckDB):
    // merged labels == from-scratch labels over ALL pairs
    val allPairs = graft.queries.TextQueries.dupPairs(spark, d)
    val scratch = labels(Dedup.fromPairs(allPairs))
    val got = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("lbl")).toMap
    assert(got == scratch)
    // non-vacuity (measured 8 at sf0.001): the delta wave must merge
    // something, and both flag branches must be populated
    assert(out.count(_.getAs[Long]("relabeled") == 1L) > 0,
      "no old id relabeled — the merge path is dormant on this corpus")
    assert(out.count(_.getAs[Long]("was_old") == 0L) > 0,
      "no fresh vertex in the delta wave")
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
