package graft
import org.apache.spark.sql.functions._

/** Scale stress for the round-2/3 text operators: replicates the sf0.1
  * documents corpus k× and runs the 64-bit banded SimHash near-dup (q51
  * — replicas are exact dups, candidate pairs grow C(k,2)·n until a
  * family's band bucket crosses TextQueries.BandOccCap, where the
  * saturated bucket is shed by design — r3's skew cap), the
  * contamination check (q53 — output stays one row per test doc, so wall
  * clock should stay flat in k beyond the input scan), and the
  * duplicate-group resolution (q56). Pass criterion: q51/q56 track
  * surviving output pairs, q53 tracks input size — nothing goes
  * quadratic in docs.
  */
object StressText {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    for (copies <- Seq(1, 2, 4, 10)) {
      // ×10 offset keeps doc_id % 10 (q53's train/test split) intact
      val docs = (0 until copies).map(k =>
        base.select((col("doc_id") + k * n * 10).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
        .reduce(_ union _)
      val dir = s"/tmp/stress_text_$copies"
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // q56: every replica family is a clique (exact dups ⇒ SimHash dist
      // 0), so the pair graph holds C(copies,2)·n edges but diameter 1 —
      // label propagation must detect the fixpoint in 2 rounds and cost
      // must track the pair graph, not its square
      // round-4 additions: q61 (line dedup — line vocab is constant
      // across replicas, so the postings join grows linearly), q64
      // (packing — pure window cumsum), q65 (bigram LM — bigram vocab
      // constant, corpus join linear), q67 (BPE — vocabulary state is
      // IDENTICAL at every k, so wall clock must stay flat)
      // round-6 additions: q71 (corpus shuffle — funnel + one partitioned
      // window, linear), q72 (incremental dedup — replica families make
      // every new-batch doc match its cross-split replicas; probe fan-out
      // is bucket-capped, so cost tracks matches, never pairs²), q73
      // (content-hash dedup — pure hash groupBy, clusters of size =
      // copies)
      // q77 (TF-IDF): term vocabulary is constant across replicas, so tf/df
      // both grow linearly and idfq ≈ invariant ((10⁶·kN) div (k·df)) —
      // wall clock must track the token scan
      // round-6 session-3: q80 (decontamination — replica hit pairs grow
      // k×k per original leak pair but leakage mass is tiny; the
      // broadcast eval side grows k× linear), q81 (span coverage — at
      // copies ≥ 2 EVERY gram is cross-doc duplicated, so the interval
      // window's "sparse dup starts" input densifies to the whole gram
      // stream: the adversarial worst case, wall clock must stay linear
      // in it)
      for (q <- Seq("q51_simhash64", "q53_contamination", "q56_dup_groups",
          "q57_corpus_funnel", "q61_line_dedup", "q64_seq_pack",
          "q65_bigram_lm", "q67_bpe_train",
          "q71_corpus_shuffle", "q72_incremental_dedup", "q73_multimodal_dedup",
          "q74_media_neardup", "q77_tfidf_topk",
          "q80_ngram_decontam", "q81_dup_spans",
          // q83/q84 (sketches): sketch size is constant in the corpus —
          // wall clock must track the gram scan; distinct-gram counts are
          // k-invariant (replicas add no new grams) so q83's estimates
          // must be IDENTICAL at every k
          "q83_kmv_distinct", "q84_cms_heavy",
          // q86 (domain affinity): bigram vocabulary constant across
          // replicas, ratios k-invariant, cost tracks the bigram scan
          "q86_domain_affinity",
          // q87 (fuzzy decontam): replica families straddle the split
          // k×k ways, but probe fan-out is bucket-capped — cost tracks
          // flagged matches, never pairs²
          "q87_fuzzy_decontam",
          // session-6 additions: q106 (BM25 — round 9: scored per
          // DISTINCT content with member counts in df/N/T, so the
          // postings pair join is base-sized at every k; only the scan,
          // the content hash agg, and the qid fan-out grow with k —
          // wall clock must track the input scan, never k² pairs),
          // q108 (group split — q56's CC over replica cliques plus a
          // per-row split expression; cost must track q56), q111
          // (incremental merge — linear scans, k-invariant sketches:
          // replicas add no new grams so kth_hash/est must be IDENTICAL
          // at every k), q113 (quantile norm — per-source windows linear,
          // value histogram k-invariant, broadcast interval join)
          "q106_bm25", "q108_group_split", "q111_incremental_merge",
          "q113_quantile_norm",
          // q114 (effective size — q56's CC plus one weighted agg; the
          // replica cliques make csz = copies·base, so eff_ratio must
          // FALL as copies grow), q116 (KS drift — value histogram is
          // k-invariant, so both the grid and every ks are IDENTICAL
          // at every k; cost tracks the two corpus hash aggs)
          "q114_effective_size", "q116_drift_ks",
          // round-8 additions: q130 (shard balance — histogram-offset
          // rank is linear; replica token masses scale k×, balance
          // ratios must stay ~1.00), q131 (mask budget — replica docs
          // are VERBATIM dups, so every doc's whole gram span is one
          // ≥threshold run per partner and coverage explode grows with
          // matched positions: the adversarial dense case, must track
          // matches not pairs²), q134 (size histogram — two aggs over
          // the memoized labels; csz scales with copies), q137
          // (coherence — replica cliques are fully verified, so every
          // family's coherence must be ≥ the base corpus's)
          "q130_shard_balance", "q131_dup_mask_budget",
          "q134_dup_size_hist", "q137_family_coherence",
          // q139/q140 ride the banded pair machinery: candidates per
          // band grow with bucket occupancy until BandOccCap sheds the
          // replica-saturated buckets (the q51 design) — cost must
          // track surviving candidates, never pairs²
          "q139_sim_calibration", "q140_band_diagnostics")) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(q)(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"STRESS $q%-18s copies=$copies%2d docs=${n * copies}%6d rows=$rows%9d  $secs%7.2f s")
        graft.queries.releasePersisted()
        spark.catalog.clearCache()
        // per-dir CC memo entries must not accumulate across the copies
        // loop, and each stress point pays its own labeling (the thing
        // being measured)
        graft.ops.TowerMemo.clear()
      }
    }
    spark.stop()
  }
}
