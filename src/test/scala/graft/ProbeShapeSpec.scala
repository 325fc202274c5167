package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.streaming.StreamingLabels

/** Round-14 probe-fix guards: the per-wave touched-bucket probes in
  * [[StreamingLabels]] must be DELTA-BOUNDED — derived from the change
  * witness `mergeLabelsDelta`/`deleteLabelsDelta` already compute, via
  * broadcast semi-joins and one small hash aggregation — never a
  * table×table shuffle join of two label-table-sized frames (the r13
  * shape: `old FULL OUTER JOIN merged ON id`, invisible at sf0.1,
  * dominant per-wave cost at 100 TB).
  *
  * Two properties, asserted on every wave kind (merge / delete /
  * update):
  *  1. EXACTNESS — the delta-derived part set equals the reference
  *     full-outer formulation's on the same before/after tables (the
  *     end-to-end byte-identity of untouched buckets is separately
  *     asserted by StreamingDedupSpec's fingerprint waves).
  *  2. PLAN SHAPE — the probe's AQE final plan contains no
  *     SortMergeJoin and no ShuffledHashJoin; every join broadcasts the
  *     delta side (the PlanShapeSpec discipline). Inputs are
  *     checkpoint-backed, exactly as the wave path holds them (labels
  *     tables persisted, delta witnesses reading checkpointed CC
  *     output), so the asserted plan is the probe's own shape.
  */
class ProbeShapeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val P = 8

  /** Reference probe (the pre-r14 formulation): full outer on id. */
  private def referenceParts(oldT: DataFrame, newT: DataFrame): Set[Long] =
    oldT.select(col("id"), col("lbl"))
      .join(newT.select(col("id"), col("lbl").as("nl")), Seq("id"), "full")
      .filter(col("lbl").isNull || col("nl").isNull || col("nl") =!= col("lbl"))
      .select(pmod(col("id"), lit(P.toLong)).as("part")).distinct()
      .collect().map(_.getLong(0)).toSet

  private def parts(df: DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  private def assertShape(probe: DataFrame, what: String): Unit = {
    probe.count() // drive AQE to its final plan
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"$what probe planned a SortMergeJoin (table-sized shuffle):\n$plan")
    assert(!plan.contains("ShuffledHashJoin"),
      s"$what probe planned a ShuffledHashJoin (table-sized shuffle):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"$what probe lost its broadcast semi-joins:\n$plan")
  }

  test("merge/delete/update probes: exact vs reference, broadcast-only plans") {
    import spark.implicits._
    // a converged labeling over a few components, plus singleton-free
    // spread across all 8 buckets; checkpoint-backed like the wave path
    val basePairs = Seq((1L, 2L), (2L, 17L), (3L, 4L), (5L, 6L), (9L, 10L),
      (11L, 12L), (20L, 28L), (21L, 22L)).toDF("da", "db").localCheckpoint(true)
    val old = Dedup.fromPairs(basePairs).localCheckpoint(true)

    // ---- merge wave: a fresh id joins, two components fuse, one pair
    // is internal (no-op) ----
    val wave = Seq((33L, 3L), (5L, 9L), (1L, 2L)).toDF("da", "db")
      .localCheckpoint(true)
    val md = Dedup.mergeLabelsDelta(old, wave)
    val merged = md.labels.localCheckpoint(true)
    val changedReps = md.changedReps.localCheckpoint(true)
    val mergeProbe = StreamingLabels.changedParts(old, merged,
      StreamingLabels.mergeCandIds(old, wave, changedReps), P)
    assert(parts(mergeProbe) === referenceParts(old, merged),
      "merge probe diverged from the reference full-outer formulation")
    assertShape(mergeProbe, "merge")

    // ---- delete wave: a bridge removal splits a component, one doc
    // becomes pairless and drops ----
    val del = Seq(2L, 5L).toDF("id").localCheckpoint(true)
    val dd = Dedup.deleteLabelsDelta(merged, basePairs.unionByName(wave), del)
    val live = dd.labels.localCheckpoint(true)
    val deadLbls = dd.deadLbls.localCheckpoint(true)
    val deleteProbe = StreamingLabels.changedParts(merged, live,
      StreamingLabels.deleteCandIds(merged, deadLbls), P)
    assert(parts(deleteProbe) === referenceParts(merged, live),
      "delete probe diverged from the reference full-outer formulation")
    assertShape(deleteProbe, "delete")

    // ---- update wave: re-crawl ids 3 and 21 — old pairs die, new
    // content re-pairs 3 with 20's component, 21 drops pairless ----
    val upd = Seq(3L, 21L).toDF("id").localCheckpoint(true)
    val livePairs = basePairs.unionByName(wave)
      .join(del.select(col("id").as("da")), Seq("da"), "left_anti")
      .join(del.select(col("id").as("db")), Seq("db"), "left_anti")
      .localCheckpoint(true)
    val ud = Dedup.deleteLabelsDelta(live, livePairs, upd)
    val afterDel = ud.labels.localCheckpoint(true)
    val updWave = Seq((3L, 20L)).toDF("da", "db").localCheckpoint(true)
    val um = Dedup.mergeLabelsDelta(afterDel, updWave)
    val updMerged = um.labels.localCheckpoint(true)
    val updReps = um.changedReps.localCheckpoint(true)
    val cand = StreamingLabels.deleteCandIds(live, ud.deadLbls.localCheckpoint(true))
      .union(StreamingLabels.mergeCandIds(afterDel, updWave, updReps))
    val updateProbe = StreamingLabels.changedParts(live, updMerged, cand, P)
    assert(parts(updateProbe) === referenceParts(live, updMerged),
      "update probe diverged from the reference full-outer formulation")
    assertShape(updateProbe, "update")

    queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
