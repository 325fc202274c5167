package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Telemetry

/** Structured Streaming twins (SURVEY.md §2.9): STATUS decode feeding a
  * last-wins route state, driven through MemoryStream micro-batches the
  * way the reference's poll loop feeds snapshots.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("streaming STATUS decode → last-wins route state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String)]
    val frames = source.toDF().toDF("ts_us", "kind", "raw")
    val state = Telemetry.routeState(Telemetry.decodeStatus(frames))
    val query = state.writeStream
      .format("memory").queryName("route_state").outputMode("complete").start()
    try {
      // poll 1: outputs 1..4 routed; position 3 is non-digit → skipped
      source.addData((1000L, "STATUS", "{BASTATUS,5,3,x,1}"),
                     (1000L, "MATRIX", "{BAcM,junk}"))
      query.processAllAvailable()
      val snap1 = spark.table("route_state").as[(Int, Int, Long)].collect().sortBy(_._1)
      assert(snap1.toSeq === Seq((1, 5, 1000L), (2, 3, 1000L), (4, 1, 1000L)))
      // poll 2: newer snapshot rewires output 1, adds output 3
      source.addData((2000L, "STATUS", "{BASTATUS,9,3,7,1}"))
      query.processAllAvailable()
      val snap2 = spark.table("route_state").as[(Int, Int, Long)].collect().sortBy(_._1)
      assert(snap2.toSeq === Seq((1, 9, 2000L), (2, 3, 2000L), (3, 7, 2000L), (4, 1, 2000L)))
      // out-of-order stale frame must NOT win
      source.addData((1500L, "STATUS", "{BASTATUS,6}"))
      query.processAllAvailable()
      val snap3 = spark.table("route_state").as[(Int, Int, Long)].collect().sortBy(_._1)
      assert(snap3.head === ((1, 9, 2000L)))
    } finally query.stop()
  }

  test("streaming session windows split on >30 min gaps (EXT-5)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, Long)]
    val events = source.toDF().toDF("ts", "user_id")
    val sessions = Telemetry.sessionCounts(events)
    val query = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      source.addData((ts(0), 7L), (ts(10), 7L), (ts(55), 7L))
      query.processAllAvailable()
      val got = spark.table("sessions")
        .select(col("user_id"), col("n_events")).as[(Long, Long)].collect().sorted
      // 10:00+10:10 fuse (gap 10m < 30m); 10:55 starts a new session
      assert(got.toSeq === Seq((7L, 1L), (7L, 2L)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState route state: last-wins + write counter, stale drops") {
    import graft.streaming.Telemetry.{RouteKeyState, RouteObs}
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RouteObs]
    val state = Telemetry.routeStateFlatMap(source.toDS())
    val q = state.writeStream.format("memory").queryName("fmgs_state")
      .outputMode("append").start()
    try {
      source.addData(RouteObs(1000, 1, 5), RouteObs(1000, 2, 3))
      q.processAllAvailable()
      source.addData(RouteObs(2000, 1, 9)) // rewire output 1
      source.addData(RouteObs(1500, 1, 6)) // stale, must not emit
      q.processAllAvailable()
      val got = spark.table("fmgs_state").as[RouteKeyState].collect()
        .sortBy(s => (s.output, s.ts_us)).toSeq
      assert(got === Seq(
        RouteKeyState(1, 5, 1000, 1),
        RouteKeyState(1, 9, 2000, 2), // second write bumps the counter
        RouteKeyState(2, 3, 1000, 1)))
    } finally q.stop()
  }

  test("transformWithState route state matches flatMapGroupsWithState semantics") {
    import graft.streaming.Telemetry.{RouteKeyState, RouteObs}
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[RouteObs]
      val q = Telemetry.routeStateTws(source.toDS())
        .writeStream.format("memory").queryName("tws_state").outputMode("append").start()
      try {
        source.addData(RouteObs(1000, 1, 5), RouteObs(1000, 2, 3))
        q.processAllAvailable()
        source.addData(RouteObs(2000, 1, 9))
        source.addData(RouteObs(1500, 1, 6)) // stale
        q.processAllAvailable()
        val got = spark.table("tws_state").as[RouteKeyState].collect()
          .sortBy(s => (s.output, s.ts_us)).toSeq
        assert(got === Seq(
          RouteKeyState(1, 5, 1000, 1),
          RouteKeyState(1, 9, 2000, 2),
          RouteKeyState(2, 3, 1000, 1)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("property: flatMap ≡ transformWithState ≡ batch max-struct on random tied streams") {
    import graft.streaming.Telemetry.{RouteKeyState, RouteObs}
    implicit val sqlCtx = spark.sqlContext
    // same provider for both twins; tws requires RocksDB anyway
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(42)
      // scenario 0 is the cross-batch equal-ts tie from the audit: an
      // equal-ts/higher-input obs in a LATER micro-batch must still win
      val scenarios: Seq[Seq[Seq[RouteObs]]] =
        Seq(Seq(Seq(RouteObs(1000, 1, 5)), Seq(RouteObs(1000, 1, 7)),
          Seq(RouteObs(1000, 1, 3)))) ++
          (1 to 4).map { _ =>
            Seq.fill(2 + rnd.nextInt(3)) {
              Seq.fill(1 + rnd.nextInt(3)) {
                RouteObs(1000L * (1 + rnd.nextInt(3)), 1 + rnd.nextInt(2), 1 + rnd.nextInt(5))
              }
            }
          }
      for ((batches, si) <- scenarios.zipWithIndex) {
        def run(twin: org.apache.spark.sql.Dataset[RouteObs] =>
            org.apache.spark.sql.Dataset[RouteKeyState], qn: String): Seq[RouteKeyState] = {
          val src = MemoryStream[RouteObs]
          val q = twin(src.toDS()).writeStream.format("memory").queryName(qn)
            .outputMode("append").start()
          try batches.foreach { b => src.addData(b: _*); q.processAllAvailable() }
          finally q.stop()
          spark.table(qn).as[RouteKeyState].collect().sortBy(s => (s.output, s.writes)).toSeq
        }
        val fm = run(Telemetry.routeStateFlatMap, s"prop_fm_$si")
        val tws = run(Telemetry.routeStateTws, s"prop_tws_$si")
        // identical batching ⇒ identical full emission histories,
        // write counters included
        assert(fm === tws, s"scenario $si: twins diverge")
        val expect = Telemetry.routeState(spark.createDataset(batches.flatten).toDF())
          .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
        val fin = fm.groupBy(_.output).values.map(_.maxBy(_.writes))
          .map(s => (s.output, s.input, s.ts_us)).toSeq.sortBy(_._1)
        assert(fin === expect, s"scenario $si: final state != batch max-struct")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("custom DSv2 telemetry poll source feeds the route-state pipeline") {
    val frames = spark.readStream
      .format(classOf[graft.sources.TelemetrySourceProvider].getName)
      .option("numOutputs", "4").option("numInputs", "8")
      .option("pollsPerBatch", "3").option("maxPolls", "7")
      .load()
    val state = Telemetry.routeState(Telemetry.decodeStatus(frames))
    val q = state.writeStream.format("memory").queryName("dsv2_state")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dsv2_state").as[(Int, Int, Long)].collect()
        .sortBy(_._1).toSeq
      // last poll processed is poll 6 (offsets cap at 7, range [0,7)) —
      // state must equal the device model there, event time 6×2s
      val lastPoll = 6L
      val expect = (1 to 4).map(o =>
        (o, graft.sources.TelemetrySource.routeAt(o, lastPoll, 8), lastPoll * 2000000L))
      assert(got === expect)
    } finally q.stop()
  }

  test("session windows run on the RocksDB state store (100 TB state path)") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
      val sessions = Telemetry.sessionCounts(source.toDF().toDF("ts", "user_id"))
      val q = sessions.writeStream.format("memory").queryName("rocks_sessions")
        .outputMode("complete").start()
      try {
        def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 09:$min%02d:00")
        source.addData((ts(0), 1L), (ts(5), 1L), (ts(50), 1L))
        q.processAllAvailable()
        val got = spark.table("rocks_sessions")
          .select(col("user_id"), col("n_events")).as[(Long, Long)].collect().sorted
        assert(got.toSeq === Seq((1L, 1L), (1L, 2L)))
        // confirm RocksDB actually backed the state store
        assert(q.lastProgress.stateOperators.head.customMetrics
          .containsKey("rocksdbGetCount"), q.lastProgress.toString)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("liveness heartbeat flags stale devices") {
    val frames = Seq(("r1", 100L), ("r1", 90L), ("r2", 10L)).toDF("device", "ts_us")
    val got = Telemetry.liveness(frames, nowUs = 105L, staleAfterUs = 10L)
      .as[(String, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("r1", 100L, true), ("r2", 10L, false)))
  }
}
