package graft

import org.apache.spark.sql.functions._

/** Adversarial skew stress for the banded near-dup joins (VERDICT r2 #5):
  * replaces 20% of the sf0.1 corpus with ONE identical text — every band
  * of those docs lands on a single (band, key) bucket, which un-capped
  * would hand one task occ² candidate pairs (≈10⁶ docs² at this scale,
  * ~10¹⁸ at corpus scale). With the occupancy cap the saturated bucket is
  * dropped (its members remain detectable by q30 exact-dedup — a
  * byte-identical text is not a NEAR-dup problem), wall-clock stays flat
  * vs. the clean corpus, and pairs on non-capped keys are unchanged.
  * Also prints the clean corpus' max band occupancy per query — the
  * headroom that justifies the cap value.
  */
object StressBandSkew {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    // clean-corpus band occupancy headroom
    val occ51 = graft.queries.TextQueries.simhash64BandOccupancy(spark, "/root/testdata/sf0.1")
    println(s"OCC q51 clean max-band-occupancy=$occ51")

    // adversarial: doc_id % 5 == 0 gets one fixed text (20% identical)
    val adv = base.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("the same adversarial duplicate text payload repeated across the corpus"))
        .otherwise(col("text")))
    val dir = "/tmp/stress_band_skew"
    adv.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings unchanged (q40 skew would need identical vectors; the
    // mechanism under test — the occ cap — is shared via bandOccCapped)
    for (q <- Seq("q51_simhash64", "q56_dup_groups")) {
      for ((label, d) <- Seq("clean" -> "/root/testdata/sf0.1", "adversarial" -> dir)) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, d).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"SKEW $q%-16s $label%-11s rows=$rows%9d  $secs%7.2f s")
        graft.queries.releasePersisted()
        spark.catalog.clearCache()
      }
    }
    val occAdv = graft.queries.TextQueries.simhash64BandOccupancy(spark, dir)
    println(s"OCC q51 adversarial max-band-occupancy=$occAdv (cap=${graft.queries.TextQueries.BandOccCap})")
    spark.stop()
  }
}
