package graft
import org.apache.spark.sql.SparkSession

/** Per-query timing probe: `runMain graft.BenchOne <sfDir> <q>...` runs
  * each named query twice (second run amortizes codegen/JIT) and prints
  * both timings — the iterate-on-one-operator loop Bench is too coarse
  * for.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // A/B knobs for the LoopScope measurement loop (ops.LoopScope doc)
      .config("spark.graft.loopAqeOff",
        sys.env.getOrElse("GRAFT_LOOP_AQE_OFF", "false"))
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_LOOP_PARTS").foreach(n =>
      builder.config("spark.graft.loopShufflePartitions", n))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"BENCHONE $name rep$rep rows=$n%8d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache() // measure each rep cold on its caches
    }
    spark.stop()
  }
}
