package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning (SURVEY §4 rewrite table) and streaming checkpoint
  * recovery for the custom DSv2 source — both asserted on behavior.
  */
class PruningAndRecoverySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("partitioned parquet scan prunes partitions on the filter key") {
    val dir = Files.createTempDirectory("part").toString + "/events"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val planned = one.queryExecution.executedPlan.toString
    // the filter lands in the scan's PartitionFilters, not a post-scan Filter
    assert(planned.contains("PartitionFilters") &&
      planned.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"), planned)
    val total = spark.read.parquet(dir).count()
    assert(one.count() > 0 && one.count() < total)
  }

  test("DSv2 telemetry source resumes from checkpoint, no rewound polls") {
    val ckpt = Files.createTempDirectory("ckpt").toString
    val out = Files.createTempDirectory("rec_out").toString + "/frames"
    def run(maxPolls: Int): Unit = {
      val frames = spark.readStream
        .format(classOf[graft.sources.TelemetrySourceProvider].getName)
        .option("numOutputs", "2").option("pollsPerBatch", "2")
        .option("maxPolls", maxPolls.toString)
        .load().filter(col("kind") === "STATUS")
      val q = frames.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run(maxPolls = 4)
    val firstTs = spark.read.parquet(out).select("ts_us").as[Long].collect().toSeq
    assert(firstTs.sorted === Seq(0L, 2000000L, 4000000L, 6000000L)) // polls 0..3
    // restart with a larger horizon: must continue at poll 4, not repeat
    run(maxPolls = 8)
    val allTs = spark.read.parquet(out).select("ts_us").as[Long].collect().toSeq
    assert(allTs.sorted === (0L until 8L).map(_ * 2000000L),
      allTs.sorted.mkString(",")) // exactly once: polls 0..7, no dupes
  }
}
