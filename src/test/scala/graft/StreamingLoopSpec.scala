package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeviceTransport, TelemetrySource, WireProtocol}
import graft.streaming.{RouteCommandSink, Telemetry}
import graft.streaming.Telemetry.{RouteKeyState, RouteObs}

/** The reference's §3.1 lifecycle end-to-end over REAL sockets: DSv2 TCP
  * poll source → STATUS decode → transformWithState last-wins route
  * state → RouteCommandSink pushing route commands back over TCP —
  * against two loopback fixture devices (one poll stream per device,
  * the reference's one-thread-per-device shape), with a checkpoint
  * kill/restart mid-stream. Asserts the final route table each DEVICE
  * received equals the last-wins expectation over all polls, that the
  * restart neither rewound the device (no re-polls) nor reset the keyed
  * state (the `writes` counter keeps counting across the restart).
  */
class StreamingLoopSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("full TCP loop with mid-stream restart: poll → last-wins state → route commands") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val devices = Seq(
      ("dev_a", new DeviceFixtureServer(numOutputs = 4, numInputs = 8), 4, 8),
      ("dev_b", new DeviceFixtureServer(numOutputs = 3, numInputs = 6), 3, 6))
    val ckpts = devices.map { case (name, _, _, _) =>
      name -> Files.createTempDirectory(s"loop_$name").toString }.toMap
    val emitted = new ConcurrentLinkedQueue[(String, RouteKeyState)]()
    try {
      def runPhase(maxPolls: Int): Unit =
        for ((name, fixture, _, _) <- devices) {
          val port = fixture.port
          val frames = spark.readStream
            .format(classOf[graft.sources.TelemetrySourceProvider].getName)
            .option("host", "127.0.0.1").option("port", port.toString)
            .option("pollsPerBatch", "1").option("maxPolls", maxPolls.toString)
            .load()
          val state = Telemetry.routeStateTws(Telemetry.decodeStatus(frames).as[RouteObs])
          val q = state.writeStream
            .option("checkpointLocation", ckpts(name))
            .outputMode("append")
            .foreachBatch { (batch: Dataset[RouteKeyState], _: Long) =>
              // the loop's write half: changed keys of this micro-batch
              // go back to the device as route commands over TCP
              val changes = batch.collect()
              changes.foreach(s => emitted.add((name, s)))
              if (changes.nonEmpty) {
                val routes = changes.toSeq
                  .map(s => (name, s.output, s.input)).toDF("device", "output", "input")
                RouteCommandSink
                  .applyRoutes(routes, _ => new DeviceTransport("127.0.0.1", port))
                  .collect()
              }
              ()
            }
            .start()
          try { q.processAllAvailable() } finally q.stop() // the mid-stream "kill"
        }

      runPhase(maxPolls = 3) // polls 0..2, then die
      runPhase(maxPolls = 6) // restart from checkpoint: polls 3..5 only

      for ((name, fixture, nOut, nIn) <- devices) {
        // the device was never re-polled across the restart
        assert(fixture.polls.get() === 6, s"$name polls rewound or over-ran")
        // decode the route commands the DEVICE actually received (ignore
        // the {AB?} polls) and take the last one per output
        val frameToRoute = (for (o <- 1 to nOut; i <- 1 to nIn)
          yield WireProtocol.routeFrame(o, i) -> ((o, i))).toMap
        val appliedLast = fixture.received.toArray(Array.empty[String]).toSeq
          .flatMap(frameToRoute.get)
          .foldLeft(Map.empty[Int, Int]) { case (m, (o, i)) => m + (o -> i) }
        val expect = (1 to nOut).map(o => o -> TelemetrySource.routeAt(o, 5L, nIn)).toMap
        assert(appliedLast === expect,
          s"$name's final route table diverges from last-wins over all 6 polls")
        // keyed state SURVIVED the restart: ts advances every poll, so
        // every output updates on all 6 polls — writes would be ≤3 if the
        // restart had reset state
        val finalWrites = emitted.toArray(Array.empty[(String, RouteKeyState)]).toSeq
          .filter(_._1 == name).groupBy(_._2.output)
          .map { case (o, ss) => o -> ss.maxBy(_._2.ts_us)._2.writes }
        assert(finalWrites === (1 to nOut).map(_ -> 6L).toMap,
          s"$name write counters reset across restart: $finalWrites")
      }
    } finally {
      devices.foreach(_._2.close())
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
