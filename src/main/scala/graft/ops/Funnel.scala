package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel / retention / attribution — the product-analytics family,
  * factored over a DataFrame parameter because it is measurably VACUOUS
  * on the driver corpus (the q102/q103 dormant-branch discipline):
  * sessions cap at 3 events so session-scoped funnels complete 0 times;
  * every one of the 150 users converts over their lifetime; the corpus
  * spans one cohort week with 100% weekly activity; and 96% of
  * purchases self-attribute (all measured, CLAUDE.md round-6 notes —
  * re-measured via the FunnelSpec corpus probes). So no oracled query
  * can bind on this data; the operators take any `(user_id, ts_us,
  * event_type)` frame and FunnelSpec proves attrition, partial
  * retention, and cross-touch attribution on synthetic fixtures where
  * each genuinely binds.
  *
  * Scale shapes (all three): one shuffle on user_id, per-user state
  * bounded by the stage list / period count — never a self-join over
  * events, never a window without a partition key.
  */
object Funnel {

  /** Windowed ordered funnel: a user reaches stage i when the stages
    * before it were reached in order and an event of stage i's type
    * occurs strictly after stage i−1's reach time, within `windowUs`
    * of the stage-0 reach time. Earliest-completion semantics: each
    * reach time is the MINIMUM qualifying ts — the standard product-
    * analytics funnel (Amplitude/GA "ordered funnel, conversion
    * window").
    *
    * Output: one row per stage — (stage_idx, stage, n_reached) —
    * n_reached weakly decreasing (the attrition curve).
    *
    * Plan: one hash-agg per stage over the per-user min of qualifying
    * events (stage count is a static constant, so the loop unrolls into
    * one DAG; each step is a broadcast-free equi-join on user_id of two
    * user-grained tables), then one tiny union. No event self-join:
    * events are scanned once per stage with a pushed event_type filter.
    */
  def funnelStages(ev: DataFrame, stages: Seq[String], windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val byType = ev.select(col("user_id"), col("ts_us"), col("event_type"))
    // per-user reach table for stage 0: earliest stage-0 event.
    // Each reach table is read by TWO consumers (the next stage's join
    // and its own count) — invariant 6: without the per-stage
    // localCheckpoint the union re-derives the whole stage prefix per
    // stage (O(S²) event scans). The table is user-grained and tiny.
    var reach = byType.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
      .withColumn("t0", col("t"))
      .localCheckpoint(true)
    val counts = scala.collection.mutable.ArrayBuffer(
      reach.agg(count(lit(1)).as("n")).select(lit(0).as("stage_idx"), col("n")))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      reach = byType.filter(col("event_type") === st)
        .join(reach, Seq("user_id"))
        .filter(col("ts_us") > col("t") && col("ts_us") <= col("t0") + lit(windowUs))
        .groupBy(col("user_id"))
        // t0 is constant per user within the group (propagated from the
        // stage-0 reach row this user joined) — min() is equivalent and,
        // unlike first() (which Spark marks non-deterministic), makes
        // the determinism self-evident in the plan
        .agg(min(col("ts_us")).as("t"), min(col("t0")).as("t0"))
        .localCheckpoint(true)
      counts += reach.agg(count(lit(1)).as("n")).select(lit(i).as("stage_idx"), col("n"))
    }
    val stageNames = stages.zipWithIndex.map { case (st, i) => (i, st) }
    val names = ev.sparkSession.createDataFrame(stageNames)
      .toDF("stage_idx", "stage")
    counts.reduce(_ unionAll _)
      .join(broadcast(names), Seq("stage_idx"))
      .select(col("stage_idx"), col("stage"), col("n").as("n_reached"))
      .orderBy(col("stage_idx"))
  }

  /** Cohort retention: cohort = the period (ts_us div periodUs) of the
    * user's first event; a user is retained at offset k when they have
    * any event in cohort-period + k. Output: (cohort, offset,
    * n_active, n_cohort, retention) — the classic retention triangle.
    *
    * Plan: first-event table is one user-grained agg; activity table is
    * one distinct over (user, period); one equi-join on user_id and two
    * hash aggs — linear, no windows.
    */
  def retentionCohorts(ev: DataFrame, periodUs: Long): DataFrame = {
    // integer div, not double division + cast: a correctly-rounded
    // double quotient can round UP across a period boundary for values
    // above 2^53 (the Tables.events precision lesson)
    val firsts = ev.groupBy(col("user_id"))
      .agg(expr(s"min(ts_us) div $periodUs").as("cohort"))
    val active = ev.select(col("user_id"),
        expr(s"ts_us div $periodUs").as("period"))
      .distinct()
    val sizes = firsts.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    active.join(firsts, Seq("user_id"))
      .filter(col("period") >= col("cohort"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }

  /** Last-touch attribution: each conversion event credits the LATEST
    * touch event (of an admissible type) by the same user within
    * `windowUs` before it; unattributed conversions report the "(none)"
    * channel. Output: (channel, n_conversions).
    *
    * Plan: the touch side shuffles once on user_id; the per-conversion
    * argmax is an invariant-8 max-struct (latest ts, tie → larger
    * event_id), map-side partial. The touches⋈conversions join is
    * user-keyed, so its fan-out is per-user touches × per-user
    * conversions — bounded by session activity, never corpus².
    */
  def lastTouchAttribution(ev: DataFrame, touchTypes: Seq[String],
      convType: String, windowUs: Long): DataFrame = {
    val conv = ev.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"), col("ts_us").as("cts"))
    val touch = ev.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts_us").as("tts"), col("event_type").as("channel"))
    val credited = conv.join(touch, Seq("user_id"), "left")
      .filter(col("tts").isNull ||
        (col("tts") < col("cts") && col("tts") >= col("cts") - lit(windowUs)))
      .groupBy(col("conv_id"))
      .agg(max(struct(col("tts").as("t"), col("touch_id").as("tid"),
        col("channel").as("ch"))).as("m"))
      .select(col("conv_id"), coalesce(col("m.ch"), lit("(none)")).as("channel"))
    // conversions whose user has touches but none in-window drop out of
    // the filtered join entirely — restore them as "(none)" via the
    // conversion spine
    conv.select(col("conv_id")).join(credited, Seq("conv_id"), "left")
      .select(col("conv_id"), coalesce(col("channel"), lit("(none)")).as("channel"))
      .groupBy(col("channel")).agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("channel"))
  }
}
