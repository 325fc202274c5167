package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

/** The funnel/retention/attribution family is dormant on the driver
  * corpus (measured: 3-event session cap → 0 full conversions; all
  * users convert over a lifetime; one cohort week at 100% activity;
  * 96% self-attribution). These tests (a) prove each operator's
  * semantics on synthetic fixtures where every branch binds —
  * attrition at each stage, out-of-window and out-of-order drops,
  * partial retention, cross-channel and "(none)" attribution — and
  * (b) re-measure the corpus vacuity that keeps the family un-oracled,
  * so the dormancy claim stays a measurement, not folklore.
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"
  private val Min = 60L * 1000000L

  private def evFrame(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "ts_us", "event_type")
  }

  test("funnel attrition binds per stage: order, window, and drop-off all enforced") {
    // A completes; B stops after signup; C only views; D's purchase is
    // outside the window from stage 0; E purchases BEFORE signing up
    // (order violation — must not count); F signs up without viewing
    // (skipped stage 0 — never enters)
    val ev = evFrame(Seq(
      (1L, 1L, 0 * Min, "view"), (1L, 2L, 5 * Min, "signup"), (1L, 3L, 9 * Min, "purchase"),
      (2L, 4L, 0 * Min, "view"), (2L, 5L, 3 * Min, "signup"),
      (3L, 6L, 0 * Min, "view"),
      (4L, 7L, 0 * Min, "view"), (4L, 8L, 2 * Min, "signup"), (4L, 9L, 40 * Min, "purchase"),
      (5L, 10L, 0 * Min, "purchase"), (5L, 11L, 2 * Min, "view"), (5L, 12L, 5 * Min, "signup"),
      (6L, 13L, 1 * Min, "signup"), (6L, 14L, 2 * Min, "purchase")))
    val out = Funnel.funnelStages(ev, Seq("view", "signup", "purchase"), 30 * Min)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // stage 0: users 1,2,3,4,5 viewed; stage 1: 1,2,4,5 signed after view;
    // stage 2: only user 1 (4 out-of-window, 5's purchase precedes signup)
    assert(out == Seq((0, "view", 5L), (1, "signup", 4L), (2, "purchase", 1L)))
  }

  test("funnel earliest-reach semantics: window anchors at the FIRST stage-0 event") {
    // user re-views at 50min, but t0 stays 0 — the 55min purchase is
    // outside the 30min window measured from the first view
    val ev = evFrame(Seq(
      (1L, 1L, 0 * Min, "view"), (1L, 2L, 50 * Min, "view"),
      (1L, 3L, 52 * Min, "signup"), (1L, 4L, 55 * Min, "purchase")))
    val out = Funnel.funnelStages(ev, Seq("view", "signup", "purchase"), 30 * Min)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(out == Seq((0, 1L), (1, 0L), (2, 0L)))
  }

  test("retention triangle: partial retention and multiple cohorts bind") {
    val P = 100L // period
    val ev = evFrame(Seq(
      // cohort 0: users 1,2,3 — at offset 1 only 1,2 return; offset 2 only 1
      (1L, 1L, 10L, "view"), (1L, 2L, 110L, "view"), (1L, 3L, 250L, "view"),
      (2L, 4L, 20L, "view"), (2L, 5L, 130L, "view"),
      (3L, 6L, 30L, "view"),
      // cohort 1: user 4 — returns at offset 1
      (4L, 7L, 150L, "view"), (4L, 8L, 260L, "view")))
    val out = Funnel.retentionCohorts(ev, P)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (0L, 0L, 3L, 3L), (0L, 1L, 2L, 3L), (0L, 2L, 1L, 3L),
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 1L)))
    val ret = Funnel.retentionCohorts(ev, P).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(ret((0L, 1L)) == 2.0 / 3.0 && ret((0L, 2L)) == 1.0 / 3.0,
      "retention shares wrong — partial retention not binding")
  }

  test("last-touch attribution: latest in-window touch wins; (none) binds both ways") {
    val ev = evFrame(Seq(
      // conv 103: click at 9min beats view at 5min (latest wins)
      (1L, 101L, 5 * Min, "view"), (1L, 102L, 9 * Min, "click"), (1L, 103L, 10 * Min, "purchase"),
      // conv 202: only touch is out-of-window (40min gap) → (none)
      (2L, 201L, 0 * Min, "click"), (2L, 202L, 40 * Min, "purchase"),
      // conv 301: user has NO touches at all → (none)
      (3L, 301L, 5 * Min, "purchase"),
      // conv 403: view at 8min is the only in-window touch (click is after conv)
      (4L, 401L, 8 * Min, "view"), (4L, 402L, 10 * Min, "purchase"), (4L, 403L, 11 * Min, "click")))
    val out = Funnel.lastTouchAttribution(ev, Seq("view", "click"), "purchase", 30 * Min)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("(none)", 2L), ("click", 1L), ("view", 1L)))
  }

  test("corpus vacuity re-measured: session-windowed funnel completes 0 times; one 100%-active cohort week") {
    val ev = Tables.events(spark, d)
    val funnel = Funnel.funnelStages(ev, Seq("view", "signup", "purchase"), 30 * Min)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(funnel(0) > 0, "stage 0 empty — probe broken")
    assert(funnel(2) == 0L,
      "session-windowed funnel now completes on the corpus — vacuity claim stale, wire an oracled funnel query")
    val week = 7L * 24 * 3600 * 1000000L
    val ret = Funnel.retentionCohorts(ev, week).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(ret.forall(_._3 == 1.0),
      "weekly retention now below 100% — vacuity claim stale, wire an oracled retention query")
  }
}
