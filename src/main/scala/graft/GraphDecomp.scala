package graft
import org.apache.spark.sql.functions._

/** Round-14 graph-family decomposition: replays q154's composed
  * lifecycle STAGE BY STAGE — frozen-substrate build (the
  * graph_memo_build_old bench line), per-node attach, fold-scored
  * repair, beam serve — timing each stage and recording the
  * DATA-DEPENDENT MASSES that drive it (cell counts, occupancy, pair
  * mass, candidate rows, Spark job counts). Round 13's finding: the
  * graph family read ~2× its r12 anchor and nothing in-repo could
  * decide "regenerated embeddings moved the masses" vs "a regression" —
  * bench artifacts recorded wall and loadavg but not the masses. This
  * tool (and the masses block Bench now emits) makes that decidable:
  * fixed unroll constants (GsHops=4, KnnGK=5, DivEfC=20, Lloyd iters
  * fixed) mean the JOB COUNT is data-independent, so a wall shift with
  * flat masses and flat job count is environment; a mass shift names
  * the stage and the cause.
  *
  * Usage: `runMain graft.GraphDecomp [sfDir]` (default sf0.1).
  */
object GraphDecomp {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries
    import graft.ops.TowerMemo

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def stage[T](name: String)(run: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val out = run
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[decomp] stage=$name%-18s wall=$w%6.2f s jobs=${jobs.get() - j0}%4d")
      out
    }
    // session warmup so stage 1 doesn't absorb JVM/codegen startup
    spark.range(1000000).selectExpr("sum(id)").collect()

    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }

    // ---- masses of the substrate (the data-dependent cost drivers) ----
    val prep = TowerMemo.prep(spark, d)
    val n = prep.count()
    val cut = n * 4 / 5
    val kOld = math.ceil(math.sqrt(cut.toDouble)).toLong
    println(s"[decomp] mass n_vec=$n old_cut=$cut k_old=$kOld")

    // stage 1: the frozen substrate (graph_memo_build_old's content)
    val oldEdges = stage("old_substrate") {
      val e = TextQueries.oldDivEdges(spark, d); e.count(); e
    }
    locally {
      val occ = TowerMemo.oldEdgeAssigned(spark, d)
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("mx"), sum(col("c") * col("c")).as("sq"),
          count(lit(1)).as("cells")).collect()(0)
      println(s"[decomp] mass old_cells=${occ.getLong(2)} old_occ_max=${occ.getLong(0)} " +
        s"old_pair_mass=${occ.getLong(1)} old_cell_pairs=${TowerMemo.oldCellPairs(spark, d).count()} " +
        s"old_div_edges=${oldEdges.count()}")
    }

    // stage 2: per-node attach (q151/q154's wave cost)
    val attach = stage("attach") {
      TextQueries.attachEdges(spark, d, hold).localCheckpoint(true)
    }
    println(s"[decomp] mass wave=${n - cut} attach_edges=${attach.count()}")

    // stage 3: fold-scored repair over old∪attach (q154's delete half)
    val combined = oldEdges.unionByName(attach).localCheckpoint(true)
    val repaired = stage("repair") {
      TextQueries.repairFold(spark, d, combined, hold).localCheckpoint(true)
    }
    locally {
      val deadP = TextQueries.priorityHashOn(col("vec_id")) < lit(TextQueries.DeleteBound)
      val dead = prep.filter(deadP).select(col("vec_id"))
      val srcLive = combined.join(dead.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      val deadOut = srcLive.join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      println(s"[decomp] mass dead=${dead.count()} affected=${deadOut.select(col("src")).distinct().count()} " +
        s"dead_out_edges=${deadOut.count()} repaired_edges=${repaired.count()}")
    }

    // stage 4: the two-layer beam serve over the repaired graph
    stage("serve") {
      val deadP = TextQueries.priorityHashOn(col("vec_id")) < lit(TextQueries.DeleteBound)
      val liveAsg = TowerMemo.oldEdgeAssigned(spark, d).filter(!deadP)
      val liveCorp = TowerMemo.prep(spark, d).filter(!deadP)
      TextQueries.graphBeamSearch(spark, d, repaired,
        repAsg = liveAsg, withIsNew = true, corpus = liveCorp).count()
    }

    // reference: the full-corpus substrate (graph_memo_build / q143/q152)
    stage("full_substrate") {
      TextQueries.divEdges(spark, d).count()
    }
    locally {
      val occ = TowerMemo.edgeAssigned(spark, d)
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("mx"), sum(col("c") * col("c")).as("sq"),
          count(lit(1)).as("cells")).collect()(0)
      println(s"[decomp] mass cells=${occ.getLong(2)} occ_max=${occ.getLong(0)} " +
        s"pair_mass=${occ.getLong(1)} cell_pairs=${TowerMemo.cellPairs(spark, d).count()}")
    }

    locals.foreach(_.unpersist(false))
    // per-job overhead calibration: the stage walls above are job-count
    // dominated, so this is the number that converts a job count into
    // an expected wall on THIS box
    locally {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { spark.range(8).count(); i += 1 }
      println(s"[decomp] job_overhead_us=${(System.nanoTime() - t0) / 50000}")
    }
    val load = try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim catch { case _: Throwable => "" }
    println(s"[decomp] done loadavg=$load")
    spark.stop()
  }
}
