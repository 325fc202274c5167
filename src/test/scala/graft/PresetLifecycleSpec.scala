package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Protocol
import graft.sources.ConfigJson
import graft.streaming.{RouteCommandSink, Telemetry}

/** End-to-end preset-apply lifecycle (SURVEY.md §3.3): config JSON →
  * preset explode → command frames through the sink → device STATUS
  * read-back → decode → authoritative merge over prior state. Every stage
  * is the real library component; the "device" is a recording transport
  * whose state feeds the synthesized STATUS frame.
  */
class PresetLifecycleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("preset apply: config → frames → readback → last-wins merged state") {
    // 1. load config with a scoped preset (outputs 1-3 only)
    val dir = Files.createTempDirectory("plc")
    Files.writeString(dir.resolve("cfg.json"),
      """{"ip_address":"10.0.0.9","num_outputs":4,
        |"route_presets":[{"name":"ShowA","routes":{"1":7,"2":8,"3":9},"outputs":[1,2,3]}]}"""
        .stripMargin.replace("\n", ""))
    val cfg = ConfigJson.read(spark, dir.resolve("cfg.json").toString).collect().head
    val preset = cfg.route_presets.head
    assert(preset.outputs === Some(Seq(1, 2, 3)))

    // 2. explode preset routes scoped to its outputs, send through the sink
    val scope = preset.outputs.get.toSet
    val routes = preset.routes.toSeq
      .filter { case (out, _) => scope.contains(out) }
      .map { case (out, in) => ("dev", out, in) }
      .toDF("device", "output", "input")
    DeviceState.routes.clear()
    val result = RouteCommandSink.applyRoutes(routes, _ => DeviceState.transport _).collect().head
    assert((result.getLong(1), result.getLong(2)) === ((3L, 3L))) // 3/3 succeeded

    // 3. device STATUS read-back (outputs 1..4; output 4 keeps old route 2)
    DeviceState.routes.put(4, 2)
    val payload = (1 to 4).map(o => DeviceState.routes.getOrDefault(o, -1))
      .map(v => if (v < 0) "x" else v.toString).mkString(",")
    val frames = Seq((2000L, "STATUS", s"{BASTATUS,$payload}")).toDF("ts_us", "kind", "raw")

    // 4. decode + merge over prior state (old snapshot at ts 1000)
    val prior = Seq((1000L, 1, 1), (1000L, 4, 2)).toDF("ts_us", "output", "input")
    val merged = Telemetry.routeState(Telemetry.decodeStatus(frames).union(prior))
      .orderBy("output").as[(Int, Int, Long)].collect().toSeq
    assert(merged === Seq((1, 7, 2000L), (2, 8, 2000L), (3, 9, 2000L), (4, 2, 2000L)))
  }
}

/** Executor-side device state for the lifecycle spec (local mode: same
  * JVM, so a static map observes the sink's writes).
  */
object DeviceState {
  val routes = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
  /** Parse {ABs,OOO,III}c like the device would; silence = success. */
  def transport(frame: String): Option[String] = {
    val m = "\\{ABs,(\\d{3}),(\\d{3})\\}".r.findFirstMatchIn(frame).get
    routes.put(m.group(1).toInt, m.group(2).toInt)
    None
  }
}
