package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ConfigJson
import graft.sources.ConfigJson._

/** OP-1/OP-2 golden round trip on the FIXTURES.md §B.3 config document. */
class ConfigJsonSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val goldenJson =
    """{"ip_address":"192.168.1.100","port":4000,"num_inputs":8,"num_outputs":24,
      |"primary_num_outputs":16,"router_name":"Golf matrix",
      |"input_names":{"1":"CAM 1","2":"CAM 2"},
      |"output_groups":[{"name":"TX","color":"#aee3b0","outputs":[1,2,3]},
      |{"name":"Out 4","color":"#b0b0b0","outputs":[4]}],
      |"button_labels":{"1":"X"},"first_run":false,
      |"row_luminance":{"3":-20},
      |"route_presets":[{"name":"Show A","routes":{"1":5,"2":3},"outputs":null},
      |{"name":"TX only","routes":{"1":5},"outputs":[1,2,3]}],
      |"use_custom_ranges":true,
      |"custom_inputs":[1,2,3,4,5,6,7,8],"custom_outputs":[17,18,19,20,1,2,3,4],
      |"combine_routers":true,
      |"additional_routers":[{"ip":"192.168.1.101","port":4000,"num_outputs":8}]}"""
      .stripMargin.replace("\n", "")

  private def writeTemp(content: String): String = {
    val dir = Files.createTempDirectory("cfg")
    Files.writeString(dir.resolve("config.json"), content)
    dir.resolve("config.json").toString
  }

  test("golden config loads with int-keyed maps and null preset scope") {
    val cfg = ConfigJson.read(spark, writeTemp(goldenJson)).collect().head
    assert(cfg.ip_address === "192.168.1.100")
    assert(cfg.input_names === Map(1 -> "CAM 1", 2 -> "CAM 2"))
    assert(cfg.row_luminance === Map(3 -> -20))
    assert(cfg.output_groups.map(_.name) === Seq("TX", "Out 4"))
    assert(cfg.route_presets.head.routes === Map(1 -> 5, 2 -> 3))
    assert(cfg.route_presets.head.outputs === None) // null ⇒ all outputs
    assert(cfg.route_presets(1).outputs === Some(Seq(1, 2, 3)))
    assert(cfg.additional_routers === Seq(AdditionalRouter("192.168.1.101", 4000, 8)))
    // fields absent from the JSON get dataclass defaults
    assert(cfg.label_font_family === "Helvetica")
    assert(cfg.dark_theme === true)
    assert(cfg.crosshair_luminance_shift === 20)
    assert(cfg.toolbar_buttons_visible === RouterConfig.defaultToolbar)
  }

  test("minimal config defaults every field") {
    val cfg = ConfigJson.read(spark, writeTemp("""{"ip_address":"1.2.3.4"}""")).collect().head
    assert(cfg === RouterConfig(ip_address = "1.2.3.4"))
  }

  test("round trip preserves the document") {
    import spark.implicits._
    val in = ConfigJson.read(spark, writeTemp(goldenJson))
    val outDir = Files.createTempDirectory("cfgout").toString + "/json"
    ConfigJson.write(in, outDir)
    val back = ConfigJson.read(spark, outDir).collect().head
    assert(back === in.collect().head)
  }

  test("profile resolution: explicit arg > router ip > default; ip:port sanitized") {
    // argument order wins, --instance and --profile are synonyms
    assert(ConfigJson.profileFileName(Seq("--instance=studio2"), Some("10.0.0.9"))
      === "etl_config_studio2.json")
    assert(ConfigJson.profileFileName(Seq("-v", "--profile=a=b")) === "etl_config_a=b.json")
    assert(ConfigJson.profileFileName(routerIp = Some("10.0.0.9:4000"))
      === "etl_config_10.0.0.9_4000.json")
    assert(ConfigJson.profileFileName() === "etl_config_default.json")
  }

  test("profile fallback chain: per-ip only when it exists, else default, else first-run") {
    val dir = Files.createTempDirectory("profiles")
    // nothing on disk: resolved profile misses ⇒ first-run defaults
    val fresh = ConfigJson.readProfile(spark, dir.toString, routerIp = Some("10.0.0.9"))
      .collect().head
    assert(fresh === RouterConfig())
    // default profile exists, per-ip doesn't ⇒ default is read
    Files.writeString(dir.resolve("etl_config_default.json"),
      """{"ip_address":"192.168.1.50","router_name":"Default rig"}""")
    val viaDefault = ConfigJson.readProfile(spark, dir.toString, routerIp = Some("10.0.0.9"))
      .collect().head
    assert(viaDefault.router_name === "Default rig")
    // per-ip appears ⇒ it wins over the default (reference's post-setup switch)
    Files.writeString(dir.resolve("etl_config_10.0.0.9.json"),
      """{"ip_address":"10.0.0.9","router_name":"Studio rig"}""")
    val viaIp = ConfigJson.readProfile(spark, dir.toString, routerIp = Some("10.0.0.9"))
      .collect().head
    assert(viaIp.router_name === "Studio rig")
    // explicit profile argument beats the per-ip file
    Files.writeString(dir.resolve("etl_config_ob1.json"),
      """{"ip_address":"172.16.0.2","router_name":"OB truck"}""")
    val viaArg = ConfigJson.readProfile(spark, dir.toString,
      args = Seq("--profile=ob1"), routerIp = Some("10.0.0.9")).collect().head
    assert(viaArg.router_name === "OB truck")
  }

  test("custom ranges drive display lists, reordered outputs preserved") {
    val cfg = ConfigJson.read(spark, writeTemp(goldenJson)).collect().head
    assert(cfg.getInputs === Seq(1, 2, 3, 4, 5, 6, 7, 8))
    assert(cfg.getOutputs === Seq(17, 18, 19, 20, 1, 2, 3, 4)) // reordered, kept
    val plain = RouterConfig(num_inputs = 3, num_outputs = 2)
    assert(plain.getInputs === Seq(1, 2, 3))
    assert(plain.getOutputs === Seq(1, 2))
  }
}
