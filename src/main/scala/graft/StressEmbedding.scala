package graft
import org.apache.spark.sql.functions._

/** Scale stress for the banded sign-LSH embedding near-dup (q40):
  * replicates the sf0.1 embeddings corpus k× (replicas are EXACT
  * duplicates — cos = 1.0, identical in every band — so the true pair
  * count grows as C(k,2)·n by construction) and reports wall clock vs
  * verified pair count. Linear-in-(input+output) wall clock is the
  * pass criterion: band candidate generation must not degrade toward
  * docs² as the corpus grows.
  */
object StressEmbedding {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = base.count()
    for (copies <- Seq(1, 2, 4, 10)) {
      val emb = (0 until copies).map(k =>
        base.select((col("vec_id") + k * n * 10).as("vec_id"), col("embedding")))
        .reduce(_ union _)
      val dir = s"/tmp/stress_emb_$copies"
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val pairs = graft.queries.TextQueries.q40EmbeddingNeardup(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"STRESS copies=$copies%2d vecs=${n * copies}%7d pairs=$pairs%9d  $secs%7.2f s")
    }
    spark.stop()
  }
}
