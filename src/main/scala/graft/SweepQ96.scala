package graft
import org.apache.spark.sql.functions._

/** The round-10 q96 gate sweep (VERDICT item 7): at sf0.1 (50k docs —
  * above a 25k gate, below the round-9 100k one), run the dedup audit
  * exhaustively and in sample mode on the SAME session, print the
  * per-decile recall table side by side with the tracking deltas, and
  * time both. Adoption bar: every decile the sample can estimate
  * (≥30 sampled pairs, the Q96SampleModeSpec rule) must track full
  * recall within 0.15; if it does, the gate drops to the lowest swept
  * value that keeps every test corpus BELOW it at the verify SF
  * (sf0.01 must stay full — the oracled path).
  */
object SweepQ96 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def run(bound: Option[Long], name: String) = {
      // each mode pays its own minhashCands memo build — checkpoint
      // blocks survive clearCache, so without this the FIRST run's
      // timed window absorbs the one-time banding build and the second
      // mode rides it for free (the round-7 stress-tool rule)
      graft.ops.TowerMemo.clear()
      val t0 = System.nanoTime()
      val rows = graft.queries.TextQueries.dedupAuditCore(spark, d, bound)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
      println(f"[sweep] $name%-7s ${secs}%6.1f s, ${rows.map(_.getLong(1)).sum} pairs")
      rows.map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3))).toMap
    }
    val full = run(None, "full")
    val samp = run(Some(graft.queries.TextQueries.AuditSampleBound), "sampled")
    var worst = 0.0
    for (jb <- (full.keySet ++ samp.keySet).toSeq.sorted) {
      val (nf, rf) = full.getOrElse(jb, (0L, Double.NaN))
      val (ns, rs) = samp.getOrElse(jb, (0L, Double.NaN))
      val est = ns >= 30
      val delta = math.abs(rf - rs)
      if (est) worst = math.max(worst, delta)
      println(f"[sweep] jb=$jb%2d full n=$nf%7d r=$rf%.4f | samp n=$ns%7d r=$rs%.4f" +
        f" | d=$delta%.4f${if (est) "" else " (not estimable)"}")
    }
    println(f"[sweep] worst estimable delta = $worst%.4f (bar 0.15)")
    spark.stop()
  }
}
