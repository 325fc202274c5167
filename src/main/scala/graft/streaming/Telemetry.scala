package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** OP-4/OP-33 streaming twins (SURVEY.md §2.9): the reference's poll loop
  * is a processing-time-triggered source of (ts_us, kind, raw) frames;
  * route state is a keyed last-wins table.
  *
  * These transforms are source-agnostic — the same function body works on
  * a batch DataFrame and a streaming one (Structured Streaming's unified
  * model), which is how the specs drive them with MemoryStream.
  */
object Telemetry {

  /** Decode STATUS frames into route rows (ts_us, output, input).
    * OP-7 applied to a frame stream; non-STATUS kinds drop out.
    */
  def decodeStatus(frames: DataFrame): DataFrame =
    frames
      .filter(col("kind") === "STATUS")
      .select(col("ts_us"), explode(graft.ops.Protocol.statusRoutes(col("raw"))).as("r"))
      .select(col("ts_us"), col("r.output").as("output"), col("r.input").as("input"))

  /** Scalable last-wins route state: max-by event time per output key.
    * On a stream this is an update-mode agg (watermark on the caller);
    * complete-mode snapshot-replace (the reference's semantics,
    * etl_controller.py:2535-2537) is only viable for tiny key spaces —
    * SURVEY.md §7.4 risk 6.
    */
  def routeState(decoded: DataFrame): DataFrame =
    decoded
      .groupBy(col("output"))
      .agg(max(struct(col("ts_us"), col("input"))).as("m"))
      .select(col("output"), col("m.input").as("input"), col("m.ts_us").as("ts_us"))

  /** Liveness per device (reference: 10 s heartbeat → green/red,
    * etl_controller.py:2787-2790): age of the newest frame per device.
    */
  def liveness(frames: DataFrame, nowUs: Long, staleAfterUs: Long): DataFrame =
    frames
      .groupBy(col("device"))
      .agg(max(col("ts_us")).as("last_seen_us"))
      .select(col("device"), col("last_seen_us"),
        (lit(nowUs) - col("last_seen_us") <= staleAfterUs).as("alive"))

  /** One decoded route observation. */
  case class RouteObs(ts_us: Long, output: Int, input: Int)
  /** Current state of one output, with its write count. */
  case class RouteKeyState(output: Int, input: Int, ts_us: Long, writes: Long)

  /** OP-33 via arbitrary stateful processing
    * (`flatMapGroupsWithState`, SURVEY.md §2.9/§7.3): per-output keyed
    * state holding the newest write plus a write counter — the shape to
    * reach for when last-wins needs side state (counters, TTLs) that a
    * plain max-struct agg can't carry. Emits the key's state whenever it
    * changes; stale (out-of-order) observations emit nothing.
    */
  def routeStateFlatMap(decoded: Dataset[RouteObs]): Dataset[RouteKeyState] = {
    import decoded.sparkSession.implicits._
    decoded
      .groupByKey(_.output)
      .flatMapGroupsWithState[RouteKeyState, RouteKeyState](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (output: Int, obs: Iterator[RouteObs], state: GroupState[RouteKeyState]) =>
          val prev = state.getOption
          val writes = prev.map(_.writes).getOrElse(0L)
          // equal-timestamp ties break on highest input so the emitted
          // state never depends on shuffle iterator order
          val newest = obs.foldLeft(prev.map(s => RouteObs(s.ts_us, s.output, s.input))) {
            case (best, o) if best.forall(b =>
              o.ts_us > b.ts_us || (o.ts_us == b.ts_us && o.input > b.input)) => Some(o)
            case (best, _) => best
          }
          // same tie rule as the in-batch fold above and as
          // RouteStateProcessor: an equal-ts/higher-input observation
          // arriving in a LATER micro-batch must win too, or the final
          // state would depend on micro-batch boundary placement
          newest match {
            case Some(o) if prev.forall(p =>
                o.ts_us > p.ts_us || (o.ts_us == p.ts_us && o.input > p.input)) =>
              val next = RouteKeyState(output, o.input, o.ts_us, writes + 1)
              state.update(next)
              Iterator.single(next)
            case _ => Iterator.empty
          }
      }
  }

  /** OP-33 on Spark 4's transformWithState — the successor API to
    * flatMapGroupsWithState: typed ValueState per output key, RocksDB-
    * ready, timer-capable. Same last-wins semantics as
    * [[routeStateFlatMap]] (equal-ts ties break on highest input).
    */
  class RouteStateProcessor extends StatefulProcessor[Int, RouteObs, RouteKeyState] {
    @transient private var state: ValueState[RouteKeyState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RouteKeyState](
        "route", Encoders.product[RouteKeyState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[RouteObs],
        timers: TimerValues): Iterator[RouteKeyState] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val writes = prev.map(_.writes).getOrElse(0L)
      val newest = rows.foldLeft(prev.map(s => RouteObs(s.ts_us, s.output, s.input))) {
        case (best, o) if best.forall(b =>
          o.ts_us > b.ts_us || (o.ts_us == b.ts_us && o.input > b.input)) => Some(o)
        case (best, _) => best
      }
      newest match {
        case Some(o) if prev.forall(p =>
            o.ts_us > p.ts_us || (o.ts_us == p.ts_us && o.input > p.input)) =>
          val next = RouteKeyState(key, o.input, o.ts_us, writes + 1)
          state.update(next)
          Iterator.single(next)
        case _ => Iterator.empty
      }
    }
  }

  /** [[routeStateFlatMap]] on the transformWithState API. */
  def routeStateTws(decoded: Dataset[RouteObs]): Dataset[RouteKeyState] = {
    import decoded.sparkSession.implicits._
    decoded
      .groupByKey(_.output)
      .transformWithState(new RouteStateProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** EXT-5 streaming sessionization: 30-minute session windows per user
    * (batch twin: AnalyticsQueries.q26Sessionize gaps-and-islands).
    * Works on streaming input with a watermark; `events` must carry a
    * `ts` timestamp column.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
}
