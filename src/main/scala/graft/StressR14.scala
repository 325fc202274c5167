package graft
import org.apache.spark.sql.functions._

/** Round-14 scale stress: the touched-bucket PROBE mass. The r13 wave
  * probes joined two label-table-sized frames per wave (2N rows into a
  * shuffle join); the r14 probes derive changed rows from the delta
  * witness via broadcast semi-joins + one small aggregation, so the
  * only shuffled mass is the CANDIDATE set. This tool measures, at
  * ×1/×4/×10 replica scale on real sf0.1 pairs, |candidates| vs 2N for
  * each wave kind — and re-asserts at stress scale that the
  * delta-derived part set equals the reference full-outer
  * formulation's (ProbeShapeSpec proves it at toy scale; the ×10 run
  * makes it a measured property of a 500k-pair graph).
  */
object StressR14 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries._
    import graft.streaming.StreamingLabels.{changedParts, deleteCandIds, mergeCandIds}
    val P = 16
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    def refParts(o: org.apache.spark.sql.DataFrame,
        m: org.apache.spark.sql.DataFrame): Set[Long] =
      o.select(col("id"), col("lbl"))
        .join(m.select(col("id"), col("lbl").as("nl")), Seq("id"), "full")
        .filter(col("lbl").isNull || col("nl").isNull || col("nl") =!= col("lbl"))
        .select(pmod(col("id"), lit(P.toLong)).as("part")).distinct()
        .collect().map(_.getLong(0)).toSet
    for (copies <- Seq(1, 4, 10)) {
      graft.ops.TowerMemo.clear()
      val docs = (0 until copies).map(k =>
        base.select((col("doc_id") + k * n * 10).as("doc_id"), col("text")))
        .reduce(_ union _)
      val pairs = simhash64PairsOf(docs).select(col("da"), col("db"))
        .localCheckpoint(true)
      graft.queries.releasePersisted()
      val old = graft.ops.Dedup.fromPairs(pairs).localCheckpoint(true)
      val N = old.count()

      // ---- merge wave: 100 fresh ids each pairing an existing one ----
      val seeds = old.select(col("id")).orderBy(col("id")).limit(100)
        .collect().map(_.getLong(0))
      val maxId = old.agg(max(col("id"))).collect()(0).getLong(0)
      val w1 = spark.createDataFrame(
        seeds.zipWithIndex.map { case (s, i) => (maxId + 1 + i.toLong, s) }.toSeq
      ).toDF("da", "db").localCheckpoint(true)
      val md = graft.ops.Dedup.mergeLabelsDelta(old, w1)
      val merged = md.labels.localCheckpoint(true)
      val candM = mergeCandIds(old, w1, md.changedReps.localCheckpoint(true))
        .distinct().localCheckpoint(true)
      val gotM = changedParts(old, merged, candM, P)
        .collect().map(_.getLong(0)).toSet
      assert(gotM == refParts(old, merged), s"x$copies merge probe diverged")

      // ---- delete wave: the ~1% slice ----
      val del = docs.filter(pmod(col("doc_id"), lit(97L)) === 13L)
        .select(col("doc_id").as("id")).localCheckpoint(true)
      val dd = graft.ops.Dedup.deleteLabelsDelta(old, pairs, del)
      val live = dd.labels.localCheckpoint(true)
      val candD = deleteCandIds(old, dd.deadLbls.localCheckpoint(true))
        .distinct().localCheckpoint(true)
      val gotD = changedParts(old, live, candD, P)
        .collect().map(_.getLong(0)).toSet
      assert(gotD == refParts(old, live), s"x$copies delete probe diverged")

      println(f"[stress] x$copies probe-mass: table=$N " +
        f"merge_cand=${candM.count()} delete_cand=${candD.count()} " +
        f"(old full-outer probe shuffled ${2 * N} rows per wave; " +
        f"parts merge=${gotM.size} delete=${gotD.size})")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
