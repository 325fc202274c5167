package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OP-1/OP-2 — the reference's per-profile config document as a typed
  * Dataset (reference: RouterConfig dataclass, etl_controller.py:176-225;
  * load/save etl_controller.py:3343-3349, 3303-3309).
  *
  * Semantics preserved:
  *  - schema-on-read defaulting: every missing field falls back to the
  *    dataclass default (`from_dict`'s `.get(key, default)`,
  *    etl_controller.py:332-377)
  *  - JSON stringifies int map keys; they are re-cast to int on load
  *    (etl_controller.py:163, 171, 341, 355)
  *  - `RoutePreset.outputs == null` ⇒ preset applies to all outputs
  *    (etl_controller.py:157)
  */
object ConfigJson {

  case class OutputGroup(name: String, color: String, outputs: Seq[Int] = Seq.empty)
  case class RoutePreset(
      name: String,
      routes: Map[Int, Int],
      outputs: Option[Seq[Int]] = None)
  case class AdditionalRouter(ip: String, port: Int = 4000, num_outputs: Int = 0)
  case class RouterConfig(
      ip_address: String = "",
      port: Int = 4000,
      num_inputs: Int = 0,
      num_outputs: Int = 0,
      primary_num_outputs: Int = 0,
      router_name: String = "",
      input_names: Map[Int, String] = Map.empty,
      output_groups: Seq[OutputGroup] = Seq.empty,
      button_labels: Map[String, String] = Map.empty,
      first_run: Boolean = true,
      label_font_family: String = "Helvetica",
      label_font_size: Int = 10,
      button_font_family: String = "Helvetica",
      button_font_size: Int = 9,
      active_route_color: String = "#83f600",
      show_input_numbers: Boolean = false,
      show_output_numbers: Boolean = false,
      dark_theme: Boolean = true,
      crosshair_enabled: Boolean = false,
      crosshair_luminance_shift: Int = 20,
      crosshair_border_color: String = "#ffffff",
      row_luminance: Map[Int, Int] = Map.empty,
      route_presets: Seq[RoutePreset] = Seq.empty,
      compact_mode: Boolean = false,
      show_toolbar: Boolean = true,
      toolbar_buttons_visible: Map[String, Boolean] = RouterConfig.defaultToolbar,
      use_custom_ranges: Boolean = false,
      custom_inputs: Seq[Int] = Seq.empty,
      custom_outputs: Seq[Int] = Seq.empty,
      combine_routers: Boolean = false,
      additional_routers: Seq[AdditionalRouter] = Seq.empty) {

    /** Display input list (etl_controller.py:235-239). */
    def getInputs: Seq[Int] =
      if (use_custom_ranges && custom_inputs.nonEmpty) custom_inputs
      else 1 to num_inputs

    /** Display output list (etl_controller.py:241-246). */
    def getOutputs: Seq[Int] =
      if (use_custom_ranges && custom_outputs.nonEmpty) custom_outputs
      else 1 to num_outputs
  }

  object RouterConfig {
    val defaultToolbar: Map[String, Boolean] = Map(
      "settings" -> true, "refresh" -> false, "telemetry" -> true,
      "presets" -> true, "compact" -> false, "fit" -> true, "connection" -> true)
  }

  /** JSON wire schema: map keys are strings (as serialized), presets
    * nested, unknown fields ignored by the explicit schema.
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("ip_address", StringType),
    StructField("port", IntegerType),
    StructField("num_inputs", IntegerType),
    StructField("num_outputs", IntegerType),
    StructField("primary_num_outputs", IntegerType),
    StructField("router_name", StringType),
    StructField("input_names", MapType(StringType, StringType)),
    StructField("output_groups", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("color", StringType),
      StructField("outputs", ArrayType(IntegerType)))))),
    StructField("button_labels", MapType(StringType, StringType)),
    StructField("first_run", BooleanType),
    StructField("label_font_family", StringType),
    StructField("label_font_size", IntegerType),
    StructField("button_font_family", StringType),
    StructField("button_font_size", IntegerType),
    StructField("active_route_color", StringType),
    StructField("show_input_numbers", BooleanType),
    StructField("show_output_numbers", BooleanType),
    StructField("dark_theme", BooleanType),
    StructField("crosshair_enabled", BooleanType),
    StructField("crosshair_luminance_shift", IntegerType),
    StructField("crosshair_border_color", StringType),
    StructField("row_luminance", MapType(StringType, IntegerType)),
    StructField("route_presets", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("routes", MapType(StringType, IntegerType)),
      StructField("outputs", ArrayType(IntegerType)))))),
    StructField("compact_mode", BooleanType),
    StructField("show_toolbar", BooleanType),
    StructField("toolbar_buttons_visible", MapType(StringType, BooleanType)),
    StructField("use_custom_ranges", BooleanType),
    StructField("custom_inputs", ArrayType(IntegerType)),
    StructField("custom_outputs", ArrayType(IntegerType)),
    StructField("combine_routers", BooleanType),
    StructField("additional_routers", ArrayType(StructType(Seq(
      StructField("ip", StringType),
      StructField("port", IntegerType),
      StructField("num_outputs", IntegerType)))))))

  /** Load configs (one JSON document per line/file) with defaulting and
    * int-key recast. Missing fields and missing keys both default.
    */
  def read(spark: SparkSession, path: String): Dataset[RouterConfig] = {
    import spark.implicits._
    val raw = spark.read.schema(wireSchema).json(path)
    val dflt = RouterConfig()
    val intKeys = (c: org.apache.spark.sql.Column) =>
      transform_keys(c, (k, _) => k.cast("int"))
    raw.select(
      coalesce(col("ip_address"), lit(dflt.ip_address)).as("ip_address"),
      coalesce(col("port"), lit(dflt.port)).as("port"),
      coalesce(col("num_inputs"), lit(dflt.num_inputs)).as("num_inputs"),
      coalesce(col("num_outputs"), lit(dflt.num_outputs)).as("num_outputs"),
      coalesce(col("primary_num_outputs"), lit(dflt.primary_num_outputs)).as("primary_num_outputs"),
      coalesce(col("router_name"), lit(dflt.router_name)).as("router_name"),
      coalesce(intKeys(col("input_names")), typedlit(Map.empty[Int, String])).as("input_names"),
      coalesce(transform(col("output_groups"), g => struct(
        coalesce(g.getField("name"), lit("")).as("name"),
        coalesce(g.getField("color"), lit("#b0b0b0")).as("color"),
        coalesce(g.getField("outputs"), typedlit(Seq.empty[Int])).as("outputs"))),
        typedlit(Seq.empty[OutputGroup])).as("output_groups"),
      coalesce(col("button_labels"), typedlit(Map.empty[String, String])).as("button_labels"),
      coalesce(col("first_run"), lit(dflt.first_run)).as("first_run"),
      coalesce(col("label_font_family"), lit(dflt.label_font_family)).as("label_font_family"),
      coalesce(col("label_font_size"), lit(dflt.label_font_size)).as("label_font_size"),
      coalesce(col("button_font_family"), lit(dflt.button_font_family)).as("button_font_family"),
      coalesce(col("button_font_size"), lit(dflt.button_font_size)).as("button_font_size"),
      coalesce(col("active_route_color"), lit(dflt.active_route_color)).as("active_route_color"),
      coalesce(col("show_input_numbers"), lit(dflt.show_input_numbers)).as("show_input_numbers"),
      coalesce(col("show_output_numbers"), lit(dflt.show_output_numbers)).as("show_output_numbers"),
      coalesce(col("dark_theme"), lit(dflt.dark_theme)).as("dark_theme"),
      coalesce(col("crosshair_enabled"), lit(dflt.crosshair_enabled)).as("crosshair_enabled"),
      coalesce(col("crosshair_luminance_shift"), lit(dflt.crosshair_luminance_shift)).as("crosshair_luminance_shift"),
      coalesce(col("crosshair_border_color"), lit(dflt.crosshair_border_color)).as("crosshair_border_color"),
      coalesce(intKeys(col("row_luminance")), typedlit(Map.empty[Int, Int])).as("row_luminance"),
      coalesce(transform(col("route_presets"), p => struct(
        coalesce(p.getField("name"), lit("Unnamed")).as("name"),
        coalesce(intKeys(p.getField("routes")), typedlit(Map.empty[Int, Int])).as("routes"),
        p.getField("outputs").as("outputs"))),
        typedlit(Seq.empty[RoutePreset])).as("route_presets"),
      coalesce(col("compact_mode"), lit(dflt.compact_mode)).as("compact_mode"),
      coalesce(col("show_toolbar"), lit(dflt.show_toolbar)).as("show_toolbar"),
      coalesce(col("toolbar_buttons_visible"), typedlit(RouterConfig.defaultToolbar)).as("toolbar_buttons_visible"),
      coalesce(col("use_custom_ranges"), lit(dflt.use_custom_ranges)).as("use_custom_ranges"),
      coalesce(col("custom_inputs"), typedlit(Seq.empty[Int])).as("custom_inputs"),
      coalesce(col("custom_outputs"), typedlit(Seq.empty[Int])).as("custom_outputs"),
      coalesce(col("combine_routers"), lit(dflt.combine_routers)).as("combine_routers"),
      coalesce(transform(col("additional_routers"), r => struct(
        coalesce(r.getField("ip"), lit("")).as("ip"),
        coalesce(r.getField("port"), lit(4000)).as("port"),
        coalesce(r.getField("num_outputs"), lit(0)).as("num_outputs"))),
        typedlit(Seq.empty[AdditionalRouter])).as("additional_routers"))
      .as[RouterConfig]
  }

  /** Serialize back to JSON with stringified int map keys (the wire
    * format the reference writes, etl_controller.py:160-165, 227-231).
    */
  def write(ds: Dataset[RouterConfig], path: String): Unit = {
    val strKeys = (c: org.apache.spark.sql.Column) =>
      transform_keys(c, (k, _) => k.cast("string"))
    ds.toDF()
      .withColumn("input_names", strKeys(col("input_names")))
      .withColumn("row_luminance", strKeys(col("row_luminance")))
      .withColumn("route_presets", transform(col("route_presets"), p => struct(
        p.getField("name").as("name"),
        strKeys(p.getField("routes")).as("routes"),
        p.getField("outputs").as("outputs"))))
      .write.mode("overwrite").json(path)
  }

  /** Per-instance profile file name (etl_controller.py:2591-2615): an
    * explicit `--instance=`/`--profile=` argument wins (first match in
    * argument order), then the router-ip-derived name (`:` → `_` so
    * `ip:port` stays one path segment), then the pre-connection default.
    */
  def profileFileName(args: Seq[String] = Seq.empty,
      routerIp: Option[String] = None): String = {
    val explicit = args.collectFirst {
      case a if a.startsWith("--instance=") || a.startsWith("--profile=") =>
        a.split("=", 2)(1)
    }
    explicit.map(id => s"etl_config_$id.json")
      .orElse(routerIp.map(ip => s"etl_config_${ip.replace(':', '_')}.json"))
      .getOrElse("etl_config_default.json")
  }

  /** Resolve the profile actually read, with the reference's post-setup
    * fallback (etl_controller.py:2633-2641): the per-ip profile is used
    * only when it exists on disk; otherwise the pre-setup file (explicit
    * argument profile if given, else the default) stands.
    */
  def resolveProfile(configDir: String, args: Seq[String] = Seq.empty,
      routerIp: Option[String] = None): java.io.File = {
    val primary = new java.io.File(configDir, profileFileName(args, routerIp))
    if (primary.exists()) primary
    else new java.io.File(configDir, profileFileName(args, None))
  }

  /** Load the resolved profile; a missing file yields the first-run
    * defaults, exactly like the reference's `_load_config` miss path
    * (etl_controller.py:2643-2652).
    */
  def readProfile(spark: SparkSession, configDir: String,
      args: Seq[String] = Seq.empty, routerIp: Option[String] = None)
      : Dataset[RouterConfig] = {
    import spark.implicits._
    val f = resolveProfile(configDir, args, routerIp)
    if (f.exists()) read(spark, f.getPath)
    else spark.createDataset(Seq(RouterConfig()))
  }
}
