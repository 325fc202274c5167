package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q126 (integer PageRank over the within-IVF-cell
  * k-NN graph). The oracle proves the cross-engine replay; this spec
  * pins the arithmetic on a hand-computed synthetic graph — including
  * the dangling-node branch the corpus never exercises (every sf0.01
  * cell has ≥21 members, so out-degree is always KnnGK) — and the
  * corpus-level invariants.
  */
class KnnCentralitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("pageRankInt matches hand-computed ranks; dangling mass leaks") {
    import spark.implicits._
    // a <-> b cycle, plus c -> a with nothing pointing back at c:
    // c is a source whose own rank decays to the damping floor
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out = graft.ops.Graph.pageRankInt(nodes, edges, iters = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: a = 150000 + 85*(1000000 + 1000000)/100 = 1850000
    //        b = 150000 + 85*1000000/100          = 1000000
    //        c = 150000 (no in-edges — the dangling-source floor)
    // iter2: a = 150000 + 85*(1000000 + 150000)/100 = 1127500
    //        b = 150000 + 85*1850000/100            = 1722500
    // iter3: a = 150000 + 85*(1722500 + 150000)/100 = 1741625
    //        b = 150000 + 85*1127500/100            = 1108375
    assert(out == Map(1L -> 1741625L, 2L -> 1108375L, 3L -> 150000L))
  }

  test("pageRankInt DIV truncation is exact, not rounded") {
    import spark.implicits._
    // odd scale over even out-degree forces the per-edge DIV to truncate
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst") // multi-edge: odeg 2
    val out = graft.ops.Graph.pageRankInt(nodes, edges, iters = 1, scale = 1000001L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // odeg(1) = 2 (multi-edges count); contrib per edge = 1000001 DIV 2
    // = 500000 (truncates, twice); b = 150000 + (85 * 1000000) DIV 100
    assert(out(2L) == 150000L + (85L * (2 * (1000001L / 2))) / 100)
    assert(out(1L) == 150000L)
  }

  test("q126 corpus invariants: floor, spread, degree accounting") {
    val out = SparkEntry.queries("q126_knn_centrality")(spark, "/root/testdata/sf0.001").collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val k = graft.queries.TextQueries.KnnGK
    val scale = graft.queries.TextQueries.PrScale
    assert(out.length == 500)
    // every rank at or above the damping floor; total mass can only leak
    assert(out.forall(_.getLong(4) >= 15L * scale / 100))
    assert(out.map(_.getLong(4)).sum <= out.length * scale)
    // non-vacuity: hubness varies (many distinct ranks, indeg spread)
    assert(out.map(_.getLong(4)).distinct.length > out.length / 2)
    assert(out.map(_.getLong(3)).max > k, "no hub exceeded out-degree k")
    // out-degree is capped by k and in/out edge counts must balance
    assert(out.forall(_.getLong(2) <= k))
    assert(out.map(_.getLong(2)).sum == out.map(_.getLong(3)).sum)
  }
}
