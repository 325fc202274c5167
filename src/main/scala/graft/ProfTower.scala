package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch probe (round-18 optimization): per-stage wall + job counts
  * of the session tower memo builds. Not part of the driver contract.
  */
object ProfTower {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(label: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"PROFT $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  jobs=${jobs.get() - j0}%3d")
    }
    import graft.ops.TowerMemo
    t("prep")(TowerMemo.prep(spark, d).count())
    t("cent")(TowerMemo.cent(spark, d).count())
    t("assigned")(TowerMemo.assigned(spark, d).count())
    t("rsub")(TowerMemo.residualSub(spark, d).count())
    t("rcb")(TowerMemo.residualCodebooks(spark, d).count())
    t("rcodes")(TowerMemo.residualCodes(spark, d).count())
    t("probes5")(TowerMemo.probes5(spark, d).count())
    t("adcsl")(TowerMemo.ivfadcShortlist(spark, d).count())
    t("old_adcsl")(TowerMemo.oldIvfadcShortlist(spark, d).count())
    t("edge_cent")(TowerMemo.edgeCent(spark, d).count())
    t("edge_assigned")(TowerMemo.edgeAssigned(spark, d).count())
    t("cell_pairs")(TowerMemo.cellPairs(spark, d).count())
    t("div_edges")(graft.queries.TextQueries.divEdges(spark, d).count())
    t("old_edge_assigned")(TowerMemo.oldEdgeAssigned(spark, d).count())
    t("old_cell_pairs")(TowerMemo.oldCellPairs(spark, d).count())
    t("old_div_edges")(graft.queries.TextQueries.oldDivEdges(spark, d).count())
    graft.queries.releasePersisted()
    spark.stop()
  }
}
