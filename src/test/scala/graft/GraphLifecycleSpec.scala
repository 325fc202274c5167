package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed graph-index lifecycle: build the frozen old graph,
  * APPEND a wave (q151's attach), then DELETE tombstones from the
  * combined index (fold-scored repair — attach edges cross quantizer
  * cells, so pair-table scoring cannot price them) and search. The
  * individual ops are oracled (q151, q152); this spec proves they
  * COMPOSE: append-then-delete yields a servable index whose results
  * are live-only with recall against the live exact truth, and new
  * nodes that survive the delete stay reachable.
  *
  * Plus the internal-consistency law that makes the fold repair
  * trustworthy: on the purely within-cell full-corpus graph it must
  * equal the pair-scored repair EXACTLY (same DotFold values, same tie
  * order, set-equal output).
  */
class GraphLifecycleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val PM = 2147483647L
  private def isDead(id: Long): Boolean =
    (id * 1103515245L + 12345L) % PM < graft.queries.TextQueries.DeleteBound

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {

    test(s"fold repair == pair repair on the within-cell graph ($d)") {
      import graft.queries.TextQueries
      val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }
      val pairRepair = TextQueries.repairedAdjacency(spark, d, hold)
      val foldRepair = TextQueries.repairFold(spark, d,
        TextQueries.divEdges(spark, d), hold)
      assert(pairRepair.exceptAll(foldRepair).count() === 0L)
      assert(foldRepair.exceptAll(pairRepair).count() === 0L)
      locals.foreach(_.unpersist(false))
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }

    test(s"append then delete composes into a servable live index ($d)") {
      import graft.queries.TextQueries
      import graft.ops.TowerMemo
      val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }
      def deadCol(c: org.apache.spark.sql.Column) =
        pmod(c * lit(1103515245L) + lit(12345L), lit(PM)) <
          lit(TextQueries.DeleteBound)
      // wave 1: attach the new generation to the frozen old graph
      val oldEdges = TextQueries.oldDivEdges(spark, d)
      val attach = hold(TextQueries.attachEdges(spark, d, hold))
      val combined = hold(oldEdges.union(attach))
      // non-vacuity of the composition itself: the delete wave must hit
      // BOTH edge populations — some frozen edge and some attach edge
      // point at a tombstone
      val deadOldDst = oldEdges.filter(deadCol(col("dst"))).count()
      val deadAttachDst = attach.filter(deadCol(col("dst"))).count()
      assert(deadOldDst > 0, "no frozen edge lost its target — delete wave vacuous on old graph")
      assert(deadAttachDst > 0, "no attach edge lost its target — composition untested")
      // wave 2: delete from the COMBINED index
      val repaired = hold(TextQueries.repairFold(spark, d, combined, hold))
      // no tombstoned endpoint survives
      assert(repaired.filter(deadCol(col("src")) || deadCol(col("dst"))).count() === 0L)
      // degree budget holds after the composed maintenance
      val maxDeg = repaired.groupBy(col("src")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      assert(maxDeg <= TextQueries.KnnGK)
      // surviving NEW nodes keep their adjacency (repaired or intact) —
      // the appended wave is not silently dropped by the delete
      val cut = TowerMemo.oldCut(spark, d).collect()(0).getLong(0)
      val liveNewWithEdges = repaired.filter(col("src") >= cut)
        .select(col("src")).distinct().count()
      assert(liveNewWithEdges > 0, "every appended node lost its edges in the delete")
      // serve: q135 beam over the repaired combined graph, frozen reps
      // minus tombstones, live corpus truth
      val liveAsg = TowerMemo.oldEdgeAssigned(spark, d)
        .filter(!deadCol(col("vec_id")))
      val liveCorp = TowerMemo.prep(spark, d)
        .filter(!deadCol(col("vec_id")))
      val served = TextQueries.graphBeamSearch(spark, d, repaired,
        repAsg = liveAsg, corpus = liveCorp).collect()
      assert(served.length == 25)
      assert(!served.exists(r => isDead(r.getAs[Long]("vec_id"))),
        "a tombstoned vector was served after the composed maintenance")
      // recall floor vs the live exact truth: within one hit per query
      // of the delete-only path (q152) — composition must not collapse
      val hits = served.map(_.getAs[Int]("in_exact_topk").toLong).sum
      val hitsDeleteOnly = SparkEntry.queries("q152_graph_delete")(spark, d)
        .agg(sum(col("in_exact_topk"))).collect()(0).getLong(0)
      assert(hits >= hitsDeleteOnly - 5,
        s"composed recall $hits collapsed vs delete-only $hitsDeleteOnly")
      // the REGISTERED composed query (q154 — the oracle-checked twin of
      // this pipeline) must serve some surviving appended vector, or the
      // append leg of the composition is decorative (measured: 3/25 at
      // sf0.001, 5/25 at sf0.01)
      val q154 = SparkEntry.queries("q154_graph_lifecycle")(spark, d).collect()
      assert(q154.count(_.getAs[Boolean]("is_new")) > 0,
        "no appended vector survived to a post-delete top-5")
      assert(!q154.exists(r => isDead(r.getAs[Long]("vec_id"))))
      locals.foreach(_.unpersist(false))
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
  }
}
