package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q143 (diversified graph ANN): the NSW
  * heuristic-2 prune must (a) genuinely REDUCE the edge budget vs the
  * naive top-K graph, (b) never raise any vertex's out-degree above
  * [[graft.queries.TextQueries.KnnGK]], (c) keep every kept edge a
  * subset of the candidate pair domain, and (d) search at least as
  * well as the naive graph — recall(q143) ≥ recall(q135), the claim
  * the operator exists for. Asserted live at both test SFs so the
  * claims track the data, not a snapshot.
  */
class GraphDivSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def recallHits(name: String, d: String): Long =
    SparkEntry.queries(name)(spark, d)
      .agg(sum(col("in_exact_topk"))).collect()(0).getLong(0)

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"diversified edges: fewer, degree-bounded, recall >= naive ($d)") {
      val naive = graft.queries.TextQueries.knnEdges(spark, d)
      val div = graft.queries.TextQueries.divEdges(spark, d)
      val nNaive = naive.count()
      val nDiv = div.count()
      assert(nDiv < nNaive, s"prune must bind: $nDiv vs $nNaive")
      val maxDeg = div.groupBy(col("src")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      assert(maxDeg <= graft.queries.TextQueries.KnnGK)
      // kept edges are real candidate pairs (same-cell, src != dst)
      val asg = graft.ops.TowerMemo.edgeAssigned(spark, d)
        .select(col("vec_id"), col("cell"))
      val bad = div
        .join(asg.select(col("vec_id").as("src"), col("cell").as("ca")), Seq("src"))
        .join(asg.select(col("vec_id").as("dst"), col("cell").as("cb")), Seq("dst"))
        .filter(col("ca") =!= col("cb") || col("src") === col("dst"))
        .count()
      assert(bad === 0L)
      val hitsDiv = recallHits("q143_graph_ann_div", d)
      val hitsNaive = recallHits("q135_graph_ann", d)
      assert(hitsDiv >= hitsNaive,
        s"diversified recall $hitsDiv must be >= naive $hitsNaive")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }

    test(s"frozen-graph append: new nodes served, recall tracks the retrained graph ($d)") {
      // the q144 refresh decision for the GRAPH family: frozen-build +
      // per-node attach (q151) vs the full retrain (q143), both audited
      // against the same exact top-5 truth
      val frozen = SparkEntry.queries("q151_graph_append")(spark, d).collect()
      assert(frozen.length == 25)
      // non-vacuity: the appended wave must actually be SERVED — some
      // result is a new-generation vector (measured: 4/25 at sf0.001,
      // 6/25 at sf0.01), or the attach is decorative
      assert(frozen.count(_.getAs[Boolean]("is_new")) > 0,
        "no appended vector ever reached a top-5 — attach is vacuous")
      val hitsFrozen = frozen.map(_.getAs[Int]("in_exact_topk").toLong).sum
      val hitsRetrained = recallHits("q143_graph_ann_div", d)
      // the frozen index may trail the retrain (that gap is what q144's
      // refresh decision prices) but must stay within one hit per query
      // of it — a collapse means the attach wiring is broken, not a
      // freshness tradeoff
      assert(hitsFrozen >= hitsRetrained - 5,
        s"frozen recall $hitsFrozen collapsed vs retrained $hitsRetrained")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }

    test(s"graph delete: repaired adjacency sound, dead never served, recall holds ($d)") {
      import graft.queries.TextQueries
      val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }
      val deadP = (c: org.apache.spark.sql.Column) =>
        pmod(c * lit(1103515245L) + lit(12345L), lit(2147483647L)) < lit(TextQueries.DeleteBound)
      val edges = hold(TextQueries.divEdges(spark, d))
      val newAdj = hold(TextQueries.repairedAdjacency(spark, d, hold))
      // the delete must be non-vacuous on this corpus: some adjacency
      // row pointed at a tombstone, and some exact-top-5 member died
      val affected = edges.filter(!deadP(col("src")) && deadP(col("dst")))
        .select(col("src")).distinct()
      assert(affected.count() > 0, "no live vertex lost a neighbor — delete is vacuous")
      // (a) no tombstoned endpoint survives anywhere in the repaired graph
      assert(newAdj.filter(deadP(col("src")) || deadP(col("dst"))).count() === 0L)
      // (b) repair respects the degree budget
      val maxDeg = newAdj.groupBy(col("src")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      assert(maxDeg <= TextQueries.KnnGK)
      // (c) untouched vertices keep byte-identical adjacency
      val untouchedDrift = edges
        .filter(!deadP(col("src")) && !deadP(col("dst")))
        .join(affected, Seq("src"), "left_anti")
        .exceptAll(newAdj.join(affected, Seq("src"), "left_anti"))
        .count()
      assert(untouchedDrift === 0L, "an untouched vertex's adjacency moved")
      // (d) the inherit rule fires: some repaired vertex keeps an edge
      // that was NOT in its pre-delete adjacency (a dead neighbor's
      // neighbor won the re-prune)
      val inherited = newAdj.join(affected, Seq("src"), "left_semi")
        .exceptAll(edges).count()
      assert(inherited > 0, "repair never inherited a link — the candidate union is decorative")
      // (e) some cell representative died, so rep election ran
      val asg = graft.ops.TowerMemo.edgeAssigned(spark, d)
      val deadReps = asg.groupBy(col("cell")).agg(min(col("vec_id")).as("rid"))
        .filter(deadP(col("rid"))).count()
      assert(deadReps > 0, "no cell rep died — rep election untested on this corpus")
      // (f) the served list: live-only, and recall within one hit/query
      // of the pre-delete graph (deletion prices freshness, not collapse)
      val served = SparkEntry.queries("q152_graph_delete")(spark, d).collect()
      assert(served.length == 25)
      assert(!served.exists(r => (r.getAs[Long]("vec_id") * 1103515245L + 12345L)
        % 2147483647L < TextQueries.DeleteBound), "a tombstoned vector was served")
      val hitsDel = served.map(_.getAs[Int]("in_exact_topk").toLong).sum
      val hitsRetrained = recallHits("q143_graph_ann_div", d)
      assert(hitsDel >= hitsRetrained - 5,
        s"post-delete recall $hitsDel collapsed vs pre-delete $hitsRetrained")
      locals.foreach(_.unpersist(false))
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
  }
}
