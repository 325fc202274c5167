package graft
import org.apache.spark.sql.functions._

/** Scale stress for the banded sign-LSH embedding near-dup (q40) and
  * the within-cell semantic dedup (q76): replicates the sf0.1
  * embeddings corpus k× (replicas are EXACT duplicates — cos = 1.0,
  * identical in every band and in every trained cell — so the true
  * pair count grows as C(k,2)·n by construction) and reports wall
  * clock vs output. q40's pass criterion is linear-in-(input+output)
  * wall clock. q76's output is one row per vector (linear), but its
  * within-cell candidate work grows with C(k,2) per replica family by
  * SemDeDup's design — the point of the measurement is that the
  * max-struct aggregate reduces candidates map-side (no quadratic
  * MATERIALIZATION), and the mitigation at real scale is growing K
  * with the corpus (see the q76 scaladoc), not a different plan.
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
      // q82 (balanced sample): output is capped at SampleBudget rows no
      // matter the corpus — the train/assign scans dominate and must
      // stay linear; the rank window's input grows with cell membership
      // (the documented hash-bound pre-filter is the lever at real scale)
      // round-8 additions: q127 (SQ8 — dim stats and coding are linear
      // scans; the 5-query broadcast pass is linear), q129 (multi-probe
      // — the probe side stays 45 rows, candidates grow with bucket
      // occupancy: linear per band), q135 (graph search — the edge
      // derivation is the within-cell banded join; beam hops touch
      // B·(K+1) candidates per query regardless of corpus), q136
      // (truncation curve — one broadcast pass, three WindowGroupLimits)
      for ((q, fn) <- Seq(
          "q40_embedding_neardup" -> graft.queries.TextQueries.q40EmbeddingNeardup,
          "q76_semantic_dedup" -> graft.queries.TextQueries.q76SemanticDedup,
          "q82_balanced_sample" -> graft.queries.TextQueries.q82BalancedSample,
          "q127_sq8_ann" -> graft.queries.TextQueries.q127Sq8Ann,
          "q129_multiprobe_lsh" -> graft.queries.TextQueries.q129MultiProbeLsh,
          "q135_graph_ann" -> graft.queries.TextQueries.q135GraphAnn,
          // round 9: the diversified-edge twin — its extra cost is the
          // KnnGK greedy conflict joins over the same n^1.5 pair mass
          "q143_graph_ann_div" -> graft.queries.TextQueries.q143GraphAnnDiv,
          // round 11: the frozen-append twin — old build is q143's
          // n_old^1.5; the attach is wave-bounded (|wave|·DivEfC·deg
          // beam rows + |wave|·DivEfC·KnnGK conflict folds)
          "q151_graph_append" -> graft.queries.TextQueries.q151GraphAppend,
          // round 12: the delete twin — tombstone filtering is two
          // anti-joins on the degree-bounded edge list; the repair
          // candidate table is |affected|·K² worst case, pruned by
          // pair-table probes; under exact-replica pileup the dead
          // fraction stays ~12.8% of every family, so affected mass
          // grows linearly with the corpus
          "q152_graph_delete" -> graft.queries.TextQueries.q152GraphDelete,
          "q136_truncation_curve" -> graft.queries.TextQueries.q136TruncationCurve)) {
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"STRESS $q%-21s copies=$copies%2d vecs=${n * copies}%7d rows=$rows%9d  $secs%7.2f s")
        graft.queries.releasePersisted()
        spark.catalog.clearCache()
        // drop the session tower memo so every stress point pays its own
        // train+assign (the thing being measured) and per-dir entries
        // don't accumulate across the copies loop
        graft.ops.TowerMemo.clear()
      }
    }
    spark.stop()
  }
}
