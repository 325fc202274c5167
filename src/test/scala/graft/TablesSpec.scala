package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Guards `Tables.events`' schema-adaptive canonicalization itself.
  *
  * The testdata's `events.ts` physical type has changed between
  * generations (TIMESTAMP(NANOS) → timestamp[us] as of round 7); three
  * spec models that read the file raw went red when it flipped. This
  * spec proves BOTH branches of Tables.events on synthetic frames —
  * a nanos-long `ts` and a timestamp-typed `ts` encoding the same
  * instants must canonicalize to identical `ts_us` values — so the
  * next flip is caught here, not in three unrelated suites.
  */
class TablesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val instantsUs = Seq(0L, 1L, 1700000000123456L, 4102444800999999L)

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-tables-$tag")
    p.toFile.deleteOnExit()
    s"$p/fixture"
  }

  test("long branch: nanos-long ts divides to epoch micros") {
    import spark.implicits._
    val dir = freshDir("long")
    instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L + 777L, i.toLong) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")

    val out = Tables.events(spark, dir)
    assert(!out.columns.contains("ts") && out.columns.contains("ts_us"))
    assert(out.schema("ts_us").dataType == LongType)
    val got = out.orderBy("event_id").select("ts_us").as[Long].collect().toSeq
    assert(got == instantsUs, "nanos-long branch mis-truncates")
  }

  test("timestamp branch: NTZ ts converts to the same epoch micros") {
    import spark.implicits._
    val dir = freshDir("ntz")
    instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us, i.toLong) }
      .toDF("event_id", "us", "user_id")
      .select(col("event_id"),
        expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"),
        col("user_id"))
      .write.parquet(s"$dir/events.parquet")

    val out = Tables.events(spark, dir)
    assert(out.schema("ts_us").dataType == LongType)
    val got = out.orderBy("event_id").select("ts_us").as[Long].collect().toSeq
    assert(got == instantsUs, "timestamp branch diverges from the long branch")
  }

  test("real testdata reads through the adaptive branch at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val out = Tables.events(spark, s"/root/testdata/$sf")
      assert(out.schema("ts_us").dataType == LongType)
      val n = out.filter(col("ts_us") > 0L).limit(1).count()
      assert(n == 1L, s"$sf: ts_us not positive — canonicalization broken")
    }
  }
}
