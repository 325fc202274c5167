package graft

import java.net.{InetAddress, ServerSocket, SocketTimeoutException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeviceTransport, TelemetrySource, WireProtocol}
import graft.streaming.{RouteCommandSink, Telemetry}

/** Loopback device emulating the reference's wire behavior: one command
  * per connection (frame + trailing checksum char), replies terminated by
  * `}`; `{AB?}` answers a STATUS frame from the deterministic
  * [[TelemetrySource.routeAt]] model advancing per poll; route commands
  * ack, stay silent, or reply garbage per `routeMode` — the three reply
  * regimes of etl_controller.py:527-548.
  */
class DeviceFixtureServer(numOutputs: Int = 4, numInputs: Int = 8,
    @volatile var routeMode: String = "ack") extends AutoCloseable {

  private val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort
  val received = new ConcurrentLinkedQueue[String]()
  val polls = new AtomicInteger(0)

  private val thread = new Thread(() => {
    try while (!server.isClosed) {
      val s = server.accept()
      try {
        s.setSoTimeout(2000)
        val in = s.getInputStream
        val buf = new Array[Byte](1024)
        val sb = new StringBuilder
        var done = false
        while (!done) {
          val n = try in.read(buf) catch { case _: SocketTimeoutException => -1 }
          if (n <= 0) done = true
          else {
            var i = 0
            while (i < n) { sb.append((buf(i) & 0x7f).toChar); i += 1 }
            // full command = frame + 1 trailing checksum char
            val brace = sb.indexOf("}")
            if (brace >= 0 && sb.length > brace + 1) done = true
          }
        }
        val cmd = sb.toString
        received.add(cmd)
        val reply: Option[String] =
          if (cmd.contains("{AB?}")) {
            val p = polls.getAndIncrement().toLong
            Some(TelemetrySource.statusFrame(p, numOutputs, numInputs))
          } else if (cmd.startsWith("{ABs,")) routeMode match {
            case "ack"    => Some("{BAs?}")
            case "silent" => None
            case _        => Some("{WAT}")
          } else None
        reply.foreach { r =>
          s.getOutputStream.write(r.getBytes(StandardCharsets.US_ASCII))
          s.getOutputStream.flush()
        }
      } finally s.close()
    } catch { case _: Exception => () /* server closed */ }
  })
  thread.setDaemon(true)
  thread.start()

  override def close(): Unit = server.close()
}

/** OP-4/OP-5 over REAL sockets: golden frames on the wire, the
  * reference's reply regimes, and the DSv2 source polling a live TCP
  * device.
  */
class SocketPathSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("scalar WireProtocol twins == Column Protocol combinators") {
    val rows = Seq((1, 2), (12, 34), (999, 1), (255, 255))
    val got = rows.toDF("o", "i")
      .select(graft.ops.Protocol.routeFrame(col("o"), col("i")).as("f"))
      .as[String].collect()
    assert(got.toSeq === rows.map { case (o, i) => WireProtocol.routeFrame(o, i) })
    val cmds = Seq("AB?", "*BI", "ABcM,00,00,01", "ABcC,00,00", "ABJ,x")
    val gotC = cmds.toDF("c")
      .select(graft.ops.Protocol.commandFrame(col("c")).as("f"))
      .as[String].collect()
    assert(gotC.toSeq === cmds.map(WireProtocol.commandFrame))
  }

  test("DeviceTransport round-trips a status query over a real socket") {
    val fixture = new DeviceFixtureServer()
    try {
      val transport = new DeviceTransport("127.0.0.1", fixture.port)
      val reply = transport(WireProtocol.commandFrame("AB?"))
      assert(reply === Some(TelemetrySource.statusFrame(0, 4, 8)))
      // the wire saw exactly the checksummed query frame
      assert(fixture.received.peek() === WireProtocol.commandFrame("AB?"))
      // a second poll advances the device model
      assert(transport(WireProtocol.commandFrame("AB?"))
        === Some(TelemetrySource.statusFrame(1, 4, 8)))
    } finally fixture.close()
  }

  test("applyRoutes sends golden route frames over TCP; ack and silence succeed") {
    val fixture = new DeviceFixtureServer()
    try {
      val port = fixture.port
      val routes = Seq(("r1", 1, 5), ("r1", 2, 3), ("r2", 4, 1))
        .toDF("device", "output", "input")
      def run() = RouteCommandSink
        .applyRoutes(routes, _ => new DeviceTransport("127.0.0.1", port))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

      assert(run() === Seq(("r1", 2L, 2L), ("r2", 1L, 1L)))
      val wire = fixture.received.toArray(Array.empty[String]).toSet
      assert(Set(WireProtocol.routeFrame(1, 5), WireProtocol.routeFrame(2, 3),
        WireProtocol.routeFrame(4, 1)).subsetOf(wire))

      fixture.received.clear()
      fixture.routeMode = "silent" // no reply ⇒ still success (:543-548)
      assert(run() === Seq(("r1", 2L, 2L), ("r2", 1L, 1L)))

      fixture.routeMode = "garbage" // reply without BAs? ⇒ counted failed
      assert(run() === Seq(("r1", 2L, 0L), ("r2", 1L, 0L)))
    } finally fixture.close()
  }

  test("processing-time trigger paces live TCP polls like the reference's poll loop") {
    // the reference polls every 2 s (etl_controller.py TelemetryThread);
    // here: a 300 ms trigger against the loopback device, bounded by
    // maxPolls so the stream drains deterministically. Asserts the
    // trigger actually spread work across multiple micro-batches (an
    // unpaced run would take one or two).
    val fixture = new DeviceFixtureServer(numOutputs = 4, numInputs = 8)
    try {
      val frames = spark.readStream
        .format(classOf[graft.sources.TelemetrySourceProvider].getName)
        .option("host", "127.0.0.1").option("port", fixture.port.toString)
        .option("pollsPerBatch", "1").option("maxPolls", "4")
        .load()
      val state = Telemetry.routeState(Telemetry.decodeStatus(frames))
      val q = state.writeStream.format("memory").queryName("paced_state")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("300 milliseconds"))
        .start()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (fixture.polls.get() < 4 && System.nanoTime() < deadline)
          Thread.sleep(100)
        q.processAllAvailable()
        assert(fixture.polls.get() === 4)
        // batchId advanced once per trigger firing, not all-at-once
        assert(q.lastProgress.batchId >= 3, q.lastProgress.toString)
        val got = spark.table("paced_state").as[(Int, Int, Long)].collect()
          .sortBy(_._1).toSeq
        val lastPoll = 3L
        val expect = (1 to 4).map(o =>
          (o, TelemetrySource.routeAt(o, lastPoll, 8), lastPoll * 2000000L))
        assert(got === expect)
      } finally q.stop()
    } finally fixture.close()
  }

  test("DSv2 source polls a live TCP device into the route-state pipeline") {
    val fixture = new DeviceFixtureServer(numOutputs = 4, numInputs = 8)
    try {
      val frames = spark.readStream
        .format(classOf[graft.sources.TelemetrySourceProvider].getName)
        .option("host", "127.0.0.1").option("port", fixture.port.toString)
        .option("pollsPerBatch", "2").option("maxPolls", "5")
        .load()
      val state = Telemetry.routeState(Telemetry.decodeStatus(frames))
      val q = state.writeStream.format("memory").queryName("tcp_state")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table("tcp_state").as[(Int, Int, Long)].collect()
          .sortBy(_._1).toSeq
        // 5 polls served: last one is poll 4, event time 4×2s
        val lastPoll = 4L
        val expect = (1 to 4).map(o =>
          (o, TelemetrySource.routeAt(o, lastPoll, 8), lastPoll * 2000000L))
        assert(got === expect)
        assert(fixture.polls.get() === 5)
      } finally q.stop()
    } finally fixture.close()
  }
}
