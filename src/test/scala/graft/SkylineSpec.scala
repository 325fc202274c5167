package graft

import org.scalatest.funsuite.AnyFunSuite

/** q179 grid-partitioned skyline: (1) re-proven against an independent
  * Scala brute-force dominance model at sf0.001 (dims recomputed from
  * raw text with plain string ops), with the cell pre-prune's
  * non-vacuity pinned (≥1 cell dead on the real corpus — measured 10
  * at sf0.001 round 18); (2) the equal-tuple tie branch (two docs with
  * identical dim vectors both on the frontier — strict-dominance
  * excludes ties, so both must survive) and the degenerate one-doc
  * corpus forced synthetically through the factored core.
  */
class SkylineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def dimsOf(ws: Array[String]): (Long, Long, Long) = {
    val nt = ws.length.toLong
    val tris = (1 to ws.length - 2).map(i => ws.slice(i - 1, i + 2).mkString(" "))
    val rich = 1000000L * tris.distinct.size / (nt - 2)
    val stop = 1000000L * ws.count(w => w == "the" || w == "a") / nt
    (nt, rich, stop)
  }

  private def dominates(b: (Long, Long, Long), a: (Long, Long, Long)): Boolean =
    b._1 >= a._1 && b._2 >= a._2 && b._3 <= a._3 &&
      (b._1 > a._1 || b._2 > a._2 || b._3 < a._3)

  test("q179 ≡ brute-force Scala model at sf0.001; cell pre-prune binds") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 3)
    val dims = docs.map { case (id, ws) => id -> dimsOf(ws) }
    val frontier = dims.filter { case (_, a) =>
      !dims.exists { case (_, b) => dominates(b, a) }
    }.map { case (id, (nt, rich, stop)) => (id, nt, rich, stop) }.toSet

    val out = SparkEntry.queries("q179_skyline")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out == frontier, s"frontier mismatch: got $out expected $frontier")
    assert(frontier.size >= 2 && frontier.size < dims.length,
      s"degenerate frontier (${frontier.size} of ${dims.length}) — vacuous")

    // the grid pre-prune must actually kill cells on the real corpus
    val g = queries.MiscQueries.SkyG
    val (lnt, hnt) = (dims.map(_._2._1).min, dims.map(_._2._1).max)
    val (lr, hr) = (dims.map(_._2._2).min, dims.map(_._2._2).max)
    val (ls, hs) = (dims.map(_._2._3).min, dims.map(_._2._3).max)
    val cells = dims.groupBy { case (_, (nt, rich, stop)) =>
      ((nt - lnt) * g / (hnt - lnt + 1), (rich - lr) * g / (hr - lr + 1),
        (stop - ls) * g / (hs - ls + 1))
    }.view.mapValues(_.map(_._2)).toMap
    val corners = cells.map { case (k, vs) =>
      k -> ((vs.map(_._1).min, vs.map(_._2).min, vs.map(_._3).max),
        (vs.map(_._1).max, vs.map(_._2).max, vs.map(_._3).min))
    }
    val dead = corners.count { case (ck, (_, (mxnt, mxr, mns))) =>
      corners.exists { case (ak, ((mnnt, mnr, mxs), _)) =>
        ak != ck && mnnt > mxnt && mnr > mxr && mxs < mns
      }
    }
    assert(dead >= 1, "cell pre-prune never fires at sf0.001 — stage vacuous")
    // pruning soundness end-to-end is what the model equality proved;
    // the dead cells must not contain any frontier doc
    val deadDocs = corners.collect { case (ck, (_, (mxnt, mxr, mns)))
      if corners.exists { case (ak, ((mnnt, mnr, mxs), _)) =>
        ak != ck && mnnt > mxnt && mnr > mxr && mxs < mns } => cells(ck)
    }.flatten.toSet
    assert(frontier.forall { case (id, nt, rich, stop) =>
      !deadDocs.contains((nt, rich, stop)) })
  }

  test("q180 repair ≡ blind model over survivors at sf0.001; exposure live; vacuity guard throws") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 3)
    val dims = docs.map { case (id, ws) => id -> dimsOf(ws) }
    val M = queries.MiscQueries.SkyDelM
    val C = queries.MiscQueries.SkyDelC
    val mod = queries.TextQueries.PriorityMod
    def liveId(id: Long) = (id * M + C) % mod >= mod / 8
    val live = dims.filter(t => liveId(t._1))
    val sky1 = live.filter { case (_, a) =>
      !live.exists { case (_, b) => dominates(b, a) }
    }
    val sky0Ids = dims.filter { case (_, a) =>
      !dims.exists { case (_, b) => dominates(b, a) }
    }.map(_._1).toSet
    val expect = sky1.map { case (id, (nt, rich, stop)) =>
      (id, nt, rich, stop, if (sky0Ids(id)) 0 else 1)
    }.toSet
    val out = SparkEntry.queries("q180_skyline_delete")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out == expect, s"repair mismatch: got $out expected $expect")
    assert(out.exists(_._5 == 1), "no exposed doc at sf0.001 — repair branch dormant")
    assert(sky0Ids.exists(id => !liveId(id)), "slice killed no frontier doc — vacuous")

    // the in-query vacuity guard: a corpus whose frontier survives the
    // slice must THROW, not silently return a no-op repair
    import spark.implicits._
    val liveStrongId = Iterator.from(0).map(_.toLong).find(liveId).get
    val deadWeakId = Iterator.from(0).map(_.toLong)
      .find(id => !liveId(id) && id != liveStrongId).get
    val synth = Seq(
      (liveStrongId, (1 to 30).map(i => s"s$i").mkString(" ")),
      (deadWeakId, "the a the y1 y2")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      queries.MiscQueries.skylineDeleteCore(synth).collect()
    }
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(ex.getMessage.contains("repair vacuous"))

    // synthetic exposure: a dead frontier doc exclusively dominating a
    // live doc must expose it
    val liveMidId = Iterator.from(liveStrongId.toInt + 1).map(_.toLong)
      .find(id => liveId(id) && id != liveStrongId).get
    val deadTopId = Iterator.from(0).map(_.toLong)
      .find(id => !liveId(id) && id != deadWeakId).get
    val synth2 = Seq(
      (deadTopId, (1 to 40).map(i => s"t$i").mkString(" ")),
      (liveMidId, (1 to 20).map(i => s"m$i").mkString(" ")),
      (liveStrongId, "the a the z1 z2")).toDF("doc_id", "text")
    val out2 = queries.MiscQueries.skylineDeleteCore(synth2)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out2 == Set((liveMidId, 1)),
      s"exposure repair wrong: $out2 (expected only ($liveMidId, exposed=1))")
  }

  test("q181 append ≡ blind full-corpus model at sf0.001; enter and displace branches live") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 3)
    val dims = docs.map { case (id, ws) => id -> dimsOf(ws) }
    val M = queries.MiscQueries.SkyDelM
    val C = queries.MiscQueries.SkyDelC
    val mod = queries.TextQueries.PriorityMod
    def inWave(id: Long) = (id * M + C) % mod < mod / 8
    val expect = dims.filter { case (_, a) =>
      !dims.exists { case (_, b) => dominates(b, a) }
    }.map { case (id, (nt, rich, stop)) =>
      (id, nt, rich, stop, if (inWave(id)) 1 else 0)
    }.toSet
    val out = SparkEntry.queries("q181_skyline_append")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out == expect, s"append frontier mismatch: got $out expected $expect")
    assert(out.exists(_._5 == 1), "no appended doc entered the frontier")
    // displacement: some base-only frontier doc must be absent from the
    // final frontier (the base skyline computed by the model)
    val base = dims.filter(t => !inWave(t._1))
    val f0 = base.filter { case (_, a) =>
      !base.exists { case (_, b) => dominates(b, a) } }.map(_._1).toSet
    assert(f0.exists(id => !out.exists(_._1 == id)),
      "append wave displaced no base-frontier doc — branch dormant")
  }

  test("rolling skylineFold over 5 waves ≡ blind full frontier (streaming twin law)") {
    import org.apache.spark.sql.functions.col
    val docsDf = Tables.documents(spark, d).select("doc_id", "text")
    val dims = queries.MiscQueries.skyDims(docsDf).persist()
    val waves = (0 until 5).map(k => dims.filter(col("doc_id") % 5 === k))
    val folded = waves.foldLeft(dims.limit(0))(
      (st, w) => queries.MiscQueries.skylineFold(st, w).localCheckpoint(true))
    val got = folded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    dims.unpersist()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val docs = docsDf.collect().map(r => r.getLong(0) -> r.getString(1).split(" "))
      .filter(_._2.length >= 3)
    val model = docs.map { case (id, ws) => id -> dimsOf(ws) }
    val brute = model.filter { case (_, a) =>
      !model.exists { case (_, b) => dominates(b, a) }
    }.map { case (id, (nt, rich, stop)) => (id, nt, rich, stop) }.toSet
    assert(got == brute, s"rolling fold drifted from the blind frontier: $got vs $brute")
  }

  test("equal-tuple ties both survive; one-doc corpus is its own frontier") {
    import spark.implicits._
    // t1/t2: identical texts (identical dims, frontier-dominant on nt);
    // w1: dominated (shorter, same composition ratios can't save it)
    val strong = (1 to 30).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, strong), (2L, strong),
      (3L, "the a the x1 x2")).toDF("doc_id", "text")
    val out = queries.MiscQueries.skylineCore(docs)
      .collect().map(_.getLong(0)).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out.contains(1L) && out.contains(2L),
      s"equal-tuple tie dropped from the frontier: $out")
    assert(!out.contains(3L), s"dominated doc on the frontier: $out")

    val one = queries.MiscQueries.skylineCore(Seq((7L, "w1 w2 w3 w4")).toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(one == Set(7L))
  }
}
