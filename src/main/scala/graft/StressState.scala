package graft
import org.apache.spark.sql.functions._
/** Scale stress for the keyed-state operators (OP-33/OP-27/EXT-5): the
  * events table replicated N× with shifted ids/users/times, through
  * q03 (last-wins), q23 (union offsets + last-wins) and q26
  * (sessionization). Wall clock should track input size ~linearly.
  */
object StressState {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val n = base.count()
    for (copies <- Seq(1, 4, 10)) {
      val dir = s"/tmp/stress_events_$copies"
      (0 until copies).map(k =>
        base.select(
          (col("event_id") + k * n * 2).as("event_id"), col("ts"),
          (col("user_id") + k * 10000).as("user_id"),
          col("event_type"), col("value"), col("props")))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val t0 = System.nanoTime()
      val r3 = graft.queries.CoreQueries.q03LatestEvent(spark, dir).count()
      val r23 = graft.queries.StateQueries.q23UnionOffset(spark, dir).count()
      val r26 = graft.queries.AnalyticsQueries.q26Sessionize(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"STRESS copies=$copies%2d events=${n * copies}%8d q03=$r3%7d q23=$r23%7d q26=$r26%8d  $secs%7.2f s")
    }
    spark.stop()
  }
}
