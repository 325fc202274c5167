package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: `runMain graft.tools.ExplainQ q119_hdr_quantile
  * [q120_gram_novelty ...]` prints each query's formatted physical
  * plan at sf0.001 (override with SPARK_GRAFT_SF_DIR) — the per-round
  * `.explain("formatted")` discipline, one command.
  *
  * Caveats: query CONSTRUCTION can execute real jobs (TowerMemo's
  * eager checkpoints train the IVF/PQ towers once; q96 runs a
  * documents count for its threshold), so run at sf0.001 unless you
  * mean to pay for it — and the memoized ANN queries' plans show a
  * checkpoint-RDD scan, not the tower: audit tower shapes via the
  * Ivf/Pq builders directly (see PlanShapeSpec's memo-independent
  * test).
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
