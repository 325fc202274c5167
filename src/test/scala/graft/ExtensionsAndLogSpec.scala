package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** SQL registration of native expressions + OP-6/OP-4 log round trip +
  * watermarked append-mode streaming.
  */
class ExtensionsAndLogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("native expressions usable from SQL after extension registration") {
    GraftExtensions.register(spark)
    Seq(("spark", Seq(1.0f, 2.0f)), ("graft", Seq(0.5f, -1.0f)))
      .toDF("s", "v").createOrReplaceTempView("ext_t")
    val rows = spark.sql(
      """SELECT graft_poly_hash(s, 65536) AS h, graft_dot_fold(v, v) AS d
        |FROM ext_t ORDER BY s""".stripMargin)
      .as[(Long, Double)].collect()
    val expect = Seq("graft", "spark").map(s =>
      s.getBytes.foldLeft(0L)((h, b) => (h * 31 + b) % 65536))
    assert(rows.map(_._1).toSeq === expect)
    assert(rows.map(_._2).toSeq === Seq(0.5 * 0.5 + 1.0, 1.0 + 4.0))
  }

  test("round-2 native expressions usable from SQL (full surface)") {
    GraftExtensions.register(spark)
    // multi-char tokens: their hashes exceed both moduli, so the two
    // SimHash families actually diverge (single letters would not)
    Seq(("alpha beta gamma delta", Seq(1.0f, -2.0f, 3.0f, -4.0f)))
      .toDF("s", "v").createOrReplaceTempView("ext_t2")
    val row = spark.sql(
      """SELECT
        |  size(graft_shingle_hash(s, 1000000007, 2)) AS n_bigrams,
        |  graft_sign_proj_bits(v, 8) AS bits,
        |  graft_simhash16(s) AS sh_default,
        |  graft_simhash16(s, 31, 65521) AS sh_prime,
        |  size(graft_status_decode('{BASTATUS,7,x,9}')) AS n_routes,
        |  graft_struct_sort_join(array(struct(2L, 'b'), struct(1L, 'a')), ',') AS joined
        |FROM ext_t2""".stripMargin).collect().head
    assert(row.getInt(0) === 3) // "a b","b c","c d"
    // matches the Column-API twin bit-for-bit
    val twin = spark.sql("SELECT v FROM ext_t2")
      .select(graft.functions.SignProjBits(org.apache.spark.sql.functions.col("v"), 8))
      .collect().head.getLong(0)
    assert(row.getLong(1) === twin)
    assert(row.getLong(2) !== row.getLong(3)) // distinct moduli ⇒ distinct family
    assert(row.getInt(4) === 2) // 'x' dropped, positions kept
    assert(row.getString(5) === "a,b")
  }

  test("frame log round trip (OP-6 write, OP-4 batch read)") {
    val dir = Files.createTempDirectory("log").toString + "/frames"
    val frames = Seq(
      (3661000000L, "STATUS", "{BASTATUS,5,3}\n"),
      (7200000000L, "CHASSIS", "{BAcC,00,00,OSO}")).toDF("ts_us", "kind", "raw")
    Sinks.appendLog(frames, dir)
    val back = Sinks.readLog(spark, dir).orderBy("time")
      .as[(String, String, String)].collect().toSeq
    assert(back === Seq(
      ("01:01:01", "STATUS", "{BASTATUS,5,3}"),
      ("02:00:00", "CHASSIS", "{BAcC,00,00,OSO}")))
  }

  test("watermarked tumbling agg emits finalized windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Double)]
    val agg = source.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_agg").outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      source.addData((ts(10, 5), 1.0), (ts(10, 50), 2.0))
      q.processAllAvailable()
      // watermark still inside hour 10 → nothing finalized
      assert(spark.table("wm_agg").count() === 0)
      // event at 11:30 pushes watermark past 11:00 → hour-10 window emits
      source.addData((ts(11, 30), 3.0))
      q.processAllAvailable()
      val got = spark.table("wm_agg").as[(java.sql.Timestamp, Long)].collect()
      assert(got.toSeq === Seq((ts(10, 0), 2L)))
    } finally q.stop()
  }
}
