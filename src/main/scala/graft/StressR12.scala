package graft
import org.apache.spark.sql.functions._

/** The honest scale metric for q152's delete-repair (the StressR10
  * discipline applied to the graph family): at toy scale BOTH repair
  * and rebuild walls are dominated by fixed job overhead, so the
  * number that predicts 100 TB behavior is INPUT MASS — the full
  * rebuild re-derives the within-cell scored pair table (n·√n rows)
  * while the repair touches only the affected vertices' candidate
  * rows (≤ |affected|·K² plus the degree-bounded liveness anti-joins,
  * ≤ K·n). This tool replicates the sf0.1 embeddings k×, builds the
  * held index once per scale point (the production state), then
  * measures: rebuild wall (fresh divEdges over fresh pairs), repair
  * wall (repairFold against the HELD index), and both input masses.
  *
  * Replicas get distinct vec_ids AND a deterministic per-copy
  * perturbation (dim k%64 shifted by 0.001·k) — EXACT replicas would
  * degenerate the measurement: heuristic-2 prunes a replica clique to
  * degree 1 (every candidate ties cos(c, kept) = cos(c, src) and
  * conflicts), after which the repair has no candidates to price. The
  * perturbed corpus keeps realistic degree at every scale point while
  * staying fully deterministic; the seeded tombstone slice stays
  * ~12.8% throughout, so affected mass grows linearly.
  */
object StressR12 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = base.count()
    for (copies <- Seq(1, 2, 4, 10)) {
      val emb = (0 until copies).map(k =>
        base.select((col("vec_id") + k * n * 10).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> CASE WHEN i = ${k % 64} " +
            s"THEN CAST(x + ${0.001 * k} AS FLOAT) ELSE x END)").as("embedding")))
        .reduce(_ union _)
      val dir = s"/tmp/stress_r12_$copies"
      emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      graft.ops.TowerMemo.clear()
      // rebuild cost: the full index derivation (pair table + greedy)
      val t0 = System.nanoTime()
      val edges = TextQueries.divEdges(spark, dir)
      val nEdges = edges.count()
      val tRebuild = (System.nanoTime() - t0) / 1e9
      val pairMass = graft.ops.TowerMemo.cellPairs(spark, dir).count()
      // repair cost against the HELD index (divEdges is memoized now)
      val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
      def hold(df: org.apache.spark.sql.DataFrame) = { locals += df.persist(); df }
      val t1 = System.nanoTime()
      val repaired = TextQueries.repairFold(spark, dir, edges, hold)
      val nRepaired = repaired.count()
      val tRepair = (System.nanoTime() - t1) / 1e9
      // repair input mass: the affected vertices' candidate rows
      val deadP = pmod(col("vec_id") * lit(1103515245L) + lit(12345L),
        lit(2147483647L)) < lit(TextQueries.DeleteBound)
      val dead = emb.filter(deadP).select(col("vec_id")).persist()
      val srcLive = edges.join(dead.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      val affected = srcLive.join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src")).distinct()
      val nAffected = affected.count()
      val candMass = srcLive
        .join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
        .join(affected, Seq("src"), "left_semi")
        .union(srcLive.join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst").as("x"))
          .join(edges.select(col("src").as("x"), col("dst").as("y")), Seq("x"))
          .join(dead.select(col("vec_id").as("y")), Seq("y"), "left_anti")
          .filter(col("y") =!= col("src"))
          .select(col("src"), col("y").as("dst")))
        .distinct().count()
      dead.unpersist(false)
      locals.foreach(_.unpersist(false))
      println(f"STRESSR12 copies=$copies%2d vecs=${n * copies}%7d edges=$nEdges%7d " +
        f"pairMass=$pairMass%9d rebuild=${tRebuild}%6.1f s | affected=$nAffected%6d " +
        f"candMass=$candMass%8d repaired=$nRepaired%7d repair=${tRepair}%6.1f s " +
        f"massRatio=${pairMass.toDouble / candMass}%6.1f")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
