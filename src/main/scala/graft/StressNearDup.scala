package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
object StressNearDup {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    for (copies <- Seq(1, 2, 4, 10)) {
      val docs = (0 until copies).map(k =>
        base.select((col("doc_id") + k * n * 10).as("doc_id"), col("text"),
          lit("x").as("lang"), lit("x").as("source"), lit(0L).as("n_chars")))
        .reduce(_ union _)
      val dir = s"/tmp/stress_docs_$copies"
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // satisfy Tables readers for the one table the query touches
      val t0 = System.nanoTime()
      val out = graft.queries.TextQueries.q31NeardupMinhash(spark, dir)
      val pairs = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"STRESS copies=$copies%2d docs=${n * copies}%7d pairs=$pairs%9d  $secs%7.2f s")
    }
    spark.stop()
  }
}
