package graft
import org.apache.spark.sql.functions._

/** The round-9 CC algorithm race (VERDICT item 6): min-label
  * propagation + pointer jumping + partition-local pre-collapse
  * ([[graft.ops.Dedup.fromPairs]], the production path) vs alternating
  * large-star/small-star ([[graft.ops.Dedup.fromPairsStar]], Kiveris et
  * al. SoCC 2014) on IDENTICAL verified near-dup pair inputs, at ×1 and
  * ×10 replica scale of sf0.1 (the StressText corpus construction —
  * replica families are cliques, the worst case for edge-grained state).
  * Pairs are memoized once per dir and materialized BEFORE either timer
  * starts, so both algorithms pay only their own propagation. Labels
  * are asserted identical before any time is reported. Adoption bar
  * (PLANS.md): star wins ≥1.5× at ×10 or the production path stands.
  */
object StressCc {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    for (copies <- Seq(1, 10)) {
      val docs = (0 until copies).map(k =>
        base.select((col("doc_id") + k * n * 10).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
        .reduce(_ union _)
      val dir = s"/tmp/stress_cc_$copies"
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // pair derivation is charged to neither algorithm
      val pairs = graft.queries.TextQueries.dupPairs(spark, dir)
        .localCheckpoint(true)
      val nPairs = pairs.count()
      def time(name: String)(run: => org.apache.spark.sql.DataFrame)
          : (org.apache.spark.sql.DataFrame, Double) = {
        val t0 = System.nanoTime()
        val out = run.localCheckpoint(true)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"STRESS_CC $name%-10s copies=$copies%2d docs=${n * copies}%7d pairs=$nPairs%9d rows=${out.count()}%8d  $secs%7.2f s")
        (out, secs)
      }
      val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }
      val (minLbl, _) = time("minlabel") {
        graft.ops.Dedup.fromPairs(pairs, track = hold)
      }
      val (starLbl, _) = time("star") {
        graft.ops.Dedup.fromPairsStar(pairs)
      }
      val diff = minLbl.join(starLbl.withColumnRenamed("lbl", "slbl"), Seq("id"))
        .filter(col("lbl") =!= col("slbl")).count()
      println(s"STRESS_CC agree     copies=$copies label_diffs=$diff")
      assert(diff == 0L, s"star CC diverges from min-label on $diff vertices")
      locals.foreach(_.unpersist(false))
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
      graft.ops.TowerMemo.clear()
    }
    spark.stop()
  }
}
