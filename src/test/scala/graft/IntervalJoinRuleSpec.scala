package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalJoinRewrite

/** The interval-overlap join rewrite must be a pure optimization: same
  * row multiset as the nested-loop plan (multiplicity included — no
  * hidden Distinct), on well-formed, malformed (s > e), and NULL
  * intervals, while the physical plan trades the nested loop for a
  * Generate + equi-join.
  */
class IntervalJoinRuleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val B = 100L

  // deterministic interval sets: varied spans (0–3 buckets), duplicate
  // rows (multiplicity), one malformed (s > e), one NULL bound
  private def intervals(seed: Long, n: Int) = {
    val rows = (0 until n).map { i =>
      val s = (i * 37 + seed * 13) % 1000
      (seed * 1000 + i, s, s + (i * 53 + seed) % 250)
    } ++ Seq((seed * 1000 + 900, 400L, 300L), // malformed: s > e
      (seed * 1000 + 901, 100L, 150L),        // duplicate pair below
      (seed * 1000 + 901, 100L, 150L))
    rows.toDF("id", "s", "e")
      .union(Seq((seed * 1000 + 902, Option.empty[Long], Option(50L)))
        .toDF("id", "s", "e"))
  }

  private def overlapJoin(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame) =
    a.join(b, a("s") <= b("e2") && b("s2") <= a("e"))
      .select(a("id").as("ia"), b("id2").as("ib"))

  test("rewrite emits exactly the nested-loop join's row multiset") {
    val a = intervals(1, 60)
    val b = intervals(2, 60)
      .select(col("id").as("id2"), col("s").as("s2"), col("e").as("e2"))

    val naive = overlapJoin(a, b).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.ConfKey, B.toString)
    try {
      val df = overlapJoin(a, b)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naive.toSeq,
        "rewritten join differs from the nested-loop answer")
      // multiplicity preserved: the duplicated input row doubles its pairs
      val dupPairs = got.count(_._1 == 1901L)
      assert(dupPairs > 0 && dupPairs % 2 == 0 &&
        got.count(_._2 == 2901L) > 0,
        "duplicate-row multiplicity lost")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rewrite did not remove the nested loop:\n$plan")
      assert(plan.contains("Generate") &&
        (plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
          plan.contains("ShuffledHashJoin")),
        s"rewrite did not produce an equi-join plan:\n$plan")
    } finally {
      spark.conf.unset(IntervalJoinRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("rule is opt-in and leaves non-matching joins alone") {
    val a = intervals(1, 20)
    val b = intervals(2, 20)
      .select(col("id").as("id2"), col("s").as("s2"), col("e").as("e2"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    try {
      // conf unset → nested loop stays
      val p1 = overlapJoin(a, b).queryExecution.executedPlan.toString
      assert(p1.contains("BroadcastNestedLoopJoin") || p1.contains("CartesianProduct"),
        "rule fired without its conf")
      // conf set but a one-sided condition (no overlap pattern) → untouched
      spark.conf.set(IntervalJoinRewrite.ConfKey, B.toString)
      val p2 = a.join(b, a("s") <= b("e2")).queryExecution.executedPlan.toString
      assert(p2.contains("BroadcastNestedLoopJoin") || p2.contains("CartesianProduct"),
        "rule fired on a non-overlap condition")
    } finally {
      spark.conf.unset(IntervalJoinRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("rewritten q104-shaped session join equals the manual binned plan") {
    // the real corpus: session intervals from sf0.001 events, joined
    // with the EXACT q104 predicate through the rule
    val d = "/root/testdata/sf0.001"
    val sess = graft.queries.AnalyticsQueries.tagSessions(Tables.events(spark, d))
      .groupBy(col("user_id"), col("sess"))
      .agg(min(col("ts_us")).as("s"), max(col("ts_us")).as("e"))
      .select(col("user_id"), col("sess").cast("long").as("sess"), col("s"), col("e"))
      .localCheckpoint()
    val a = sess.select(col("user_id").as("ua"), col("sess").as("sa"),
      col("s"), col("e"))
    val b = sess.select(col("user_id").as("ub"), col("sess").as("sb"),
      col("s").as("s2"), col("e").as("e2"))
    def pairs = a.join(b,
        a("ua") < b("ub") && a("s") <= b("e2") && b("s2") <= a("e"))
      .select(col("ua"), col("sa"), col("ub"), col("sb"))
    val naive = pairs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.ConfKey,
      graft.queries.AnalyticsQueries.OverlapBucketUs.toString)
    try {
      val df = pairs
      val got = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
      assert(got.toSeq == naive.toSeq, "rule output differs on real session data")
      assert(got.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    } finally {
      spark.conf.unset(IntervalJoinRewrite.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq IntervalJoinRewrite)
    }
  }

  test("registered q145 rides the rule: plan shape + row parity with q104") {
    val d = "/root/testdata/sf0.001"
    val q = graft.queries.AnalyticsQueries.queries
    // row parity: the rule-driven query reproduces the manually binned
    // q104 exactly (both totally ordered the same way)
    val got = q("q145_interval_rule")(spark, d).collect().map(_.toSeq).toSeq
    val ref = q("q104_session_overlap")(spark, d).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == ref,
      "q145 differs from q104 — the rewrite is not row-equivalent")
    // plan shape: the exact frame the registered query materializes,
    // under the exact conf it pins — the rule must replace the nested
    // loop with Generate + an equi-join
    spark.conf.set(IntervalJoinRewrite.ConfKey,
      graft.queries.AnalyticsQueries.OverlapBucketUs.toString)
    try {
      val plan = graft.queries.AnalyticsQueries.q145Plan(spark, d)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"q145's inner plan kept the nested loop:\n$plan")
      assert(plan.contains("Generate") &&
        (plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin") ||
          plan.contains("ShuffledHashJoin")),
        s"q145's inner plan is not the rewritten equi-join:\n$plan")
    } finally spark.conf.unset(IntervalJoinRewrite.ConfKey)
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
