package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Color scalar operators (reference: etl_controller.py:127-143, 1686-1700,
  * 1975-1982) as pure Column arithmetic — all integer/double math is
  * IEEE-deterministic, so these are DuckDB-oracle-able.
  */
object Colors {

  /** Parse channel i (0,1,2) of a `#rrggbb` / `rrggbb` hex color to 0-255. */
  def hexChannel(hexColor: Column, i: Int): Column = {
    val stripped = regexp_replace(hexColor, "^#", "")
    conv(stripped.substr(lit(1 + 2 * i), lit(2)), 16, 10).cast("int")
  }

  /** Format r,g,b channels (0-255 ints) to `#rrggbb`. */
  def rgbHex(r: Column, g: Column, b: Column): Column =
    format_string("#%02x%02x%02x", r, g, b)

  /** OP-15 — perceived-luminance contrast color
    * (etl_controller.py:1975-1982): black over light colors, white over
    * dark; luminance = (0.299r + 0.587g + 0.114b)/255, threshold 0.5.
    */
  def contrastColor(hexColor: Column): Column = {
    val lum = (lit(0.299) * hexChannel(hexColor, 0)
      + lit(0.587) * hexChannel(hexColor, 1)
      + lit(0.114) * hexChannel(hexColor, 2)) / lit(255.0)
    when(lum > 0.5, lit("#000000")).otherwise(lit("#ffffff"))
  }

  /** OP-16 — per-channel luminance shift (etl_controller.py:1686-1700):
    * clamp(int(c * (1 + shift/100)), 0, 255), re-hexed. Python int()
    * truncates toward zero; channels are ≥0 so floor() matches.
    */
  def adjustLuminance(hexColor: Column, shiftPercent: Column): Column = {
    val factor = lit(1.0) + shiftPercent.cast("double") / lit(100.0)
    def ch(i: Int): Column =
      greatest(lit(0), least(lit(255), floor(hexChannel(hexColor, i) * factor).cast("int")))
    rgbHex(ch(0), ch(1), ch(2))
  }

  /** OP-17 — pastel color via HSL→RGB (etl_controller.py:127-143), made
    * deterministic by hash-seeding h/s/l from a key column instead of
    * random.randint (documented deviation, SURVEY.md §7.4 risk 3):
    * h = key*47 mod 361 ∈ [0,360], s = 40 + key*13 mod 26 ∈ [40,65],
    * l = 65 + key*7 mod 21 ∈ [65,85]. The HSL→RGB math is the reference's.
    */
  def pastelColor(key: Column): Column = {
    val h = pmod(key * 47, lit(361)).cast("double")
    val s = (lit(40) + pmod(key * 13, lit(26))).cast("double")
    val l = (lit(65) + pmod(key * 7, lit(21))).cast("double")
    val c = (lit(1.0) - abs(lit(2.0) * l / 100.0 - lit(1.0))) * s / lit(100.0)
    val x = c * (lit(1.0) - abs(pmod(h / lit(60.0), lit(2.0)) - lit(1.0)))
    val m = l / lit(100.0) - c / lit(2.0)
    val zero = lit(0.0)
    def rgb(r: Column, g: Column, b: Column): Seq[Column] = Seq(r, g, b)
    val Seq(r, g, b) = Seq(0, 1, 2).map { i =>
      val branches = Seq(
        rgb(c, x, zero), rgb(x, c, zero), rgb(zero, c, x),
        rgb(zero, x, c), rgb(x, zero, c), rgb(c, zero, x))
      when(h < 60, branches(0)(i))
        .when(h < 120, branches(1)(i))
        .when(h < 180, branches(2)(i))
        .when(h < 240, branches(3)(i))
        .when(h < 300, branches(4)(i))
        .otherwise(branches(5)(i))
    }
    rgbHex(
      floor((r + m) * 255).cast("int"),
      floor((g + m) * 255).cast("int"),
      floor((b + m) * 255).cast("int"))
  }

  /** OP-18 — IPv4 dotted-quad validity (etl_controller.py:1508-1514):
    * shape regex plus every octet ≤ 255.
    */
  def isValidIp(ip: Column): Column =
    ip.rlike("^(\\d{1,3}\\.){3}\\d{1,3}$") &&
      forall(split(ip, "\\."), o => o.cast("int") <= 255)
}
