package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the q155 admission-LM state — the service
  * twin q156 proved the fold law for (VERDICT r13 #4: every other
  * maintained artifact had one; the LM folded in-query only). The held
  * state is exactly q156's generation partials: trigram conditional
  * counts `cb(ctx, w)`, context counts `cu(ctx)`, and the vocabulary —
  * counts ADD across waves, the vocabulary merges as a DISTINCT UNION
  * (|V| does NOT add — the non-trivial half of the merge law). Each
  * micro-batch appends one partial generation under
  * `lmDir/{cb,cu,vocab}/gen=<batchId>`; reads fold the generations
  * algebraically (merge-on-read, the StreamingSketch discipline lifted
  * to disk so the state survives restarts), and [[compactLm]]
  * periodically folds them into one generation with a digest-certified
  * checked-rename swap so the read cost stays bounded.
  *
  * Serve point = q155's scorer over the live state: [[score]] reuses
  * [[graft.queries.PipelineQueries.lmScoreOver]] and
  * [[graft.queries.PipelineQueries.lmTrigrams]] — the SAME gram
  * derivation and integer add-V surprisal expression as the oracled
  * queries, so the service cannot drift from them (StreamingLmSpec
  * proves wave-folded state ≡ batch retrain across 3 waves with a
  * crash + replay, and that the scorer equals the q155 formulation
  * over the union corpus).
  *
  * Replay/crash safety: the commit point is the VOCAB generation's
  * `_SUCCESS` (checked first, written last). All three sub-writes are
  * overwrite-mode and derive deterministically from the batch, so a
  * crash between them replays into identical bytes.
  *
  * At scale: partials are gram-domain-sized (vocabulary² worst case,
  * never corpus-sized), the per-wave fold is one map-side-combining
  * hash agg per table, and scoring joins the wave on (ctx, w) equi-keys
  * — q155's shuffle shape.
  */
object StreamingLm {

  private def hfs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())

  /** COMMITTED wave ids: generations whose VOCAB marker — the wave's
    * declared commit point, written LAST — exists. Gating every reader
    * and the compactor on the vocab marker (not each sub-table's own
    * `_SUCCESS`) is what makes a torn wave invisible: a crash between
    * the cb/cu writes and the vocab write leaves partials on disk that
    * nothing reads and nothing compacts until the replay completes the
    * wave — otherwise a pre-replay compaction would fold the torn
    * wave's counts and the replay would then re-land them on top,
    * double-counting cb AND cu equally (invariant-invisible, permanent;
    * the round-14 review's finding).
    */
  private def committedGens(s: SparkSession, lmDir: String,
      upTo: Option[Long] = None): Seq[Long] =
    GenStore.completeGenIds(s, s"$lmDir/vocab")
      .filter(g => g <= upTo.getOrElse(Long.MaxValue))

  private def subDirs(s: SparkSession, lmDir: String, sub: String,
      gens: Seq[Long]): Seq[String] = {
    val f = hfs(s, lmDir)
    // cb/cu of a committed wave exist by write order; the filter guards
    // a manually-damaged table rather than any normal state
    gens.map(g => s"$lmDir/$sub/gen=$g")
      .filter(dir => f.exists(new org.apache.hadoop.fs.Path(dir)))
  }

  /** Fold one wave of documents `(doc_id, text)` into the LM state:
    * derive the wave's trigram partials and commit them as generation
    * `batchId`. Idempotent on the vocab `_SUCCESS` marker (the last
    * write — the wave's commit point).
    */
  def updateBatch(lmDir: String)(docs: DataFrame, batchId: Long): Unit = {
    val s = docs.sparkSession
    val f = hfs(s, lmDir)
    val vocabDir = new org.apache.hadoop.fs.Path(s"$lmDir/vocab/gen=$batchId")
    if (f.exists(new org.apache.hadoop.fs.Path(vocabDir, "_SUCCESS"))) return
    val tri = graft.queries.PipelineQueries.lmTrigrams(
      docs.select(col("doc_id"), col("text"))).persist()
    try {
      tri.groupBy(col("ctx"), col("w")).agg(count(lit(1)).as("cb"))
        .write.mode("overwrite").parquet(s"$lmDir/cb/gen=$batchId")
      tri.groupBy(col("ctx")).agg(count(lit(1)).as("cu"))
        .write.mode("overwrite").parquet(s"$lmDir/cu/gen=$batchId")
      tri.select(col("w")).distinct()
        .write.mode("overwrite").parquet(vocabDir.toString)
    } finally tri.unpersist(false)
    ()
  }

  /** The live LM state folded across committed generations:
    * `(cb(ctx, w, cb), cu(ctx, cu), vocab(w))` — counts summed, the
    * vocabulary distinct-unioned. Empty-schema frames before the first
    * wave.
    */
  def state(s: SparkSession, lmDir: String): (DataFrame, DataFrame, DataFrame) =
    stateFor(s, lmDir, committedGens(s, lmDir))

  /** The folded state over an explicit committed-wave set — the single
    * fold body [[state]], [[scoreAt]], and [[compactLm]] share, so the
    * compactor can never fold a different generation set than it
    * records as its horizon (the single-listing rule).
    */
  private def stateFor(s: SparkSession, lmDir: String,
      gens: Seq[Long]): (DataFrame, DataFrame, DataFrame) = {
    val cbGens = subDirs(s, lmDir, "cb", gens)
    val cuGens = subDirs(s, lmDir, "cu", gens)
    val vGens = subDirs(s, lmDir, "vocab", gens)
    val cb =
      if (cbGens.isEmpty)
        s.range(0).select(lit("").as("ctx"), lit("").as("w"), col("id").as("cb"))
      else s.read.parquet(cbGens: _*).groupBy(col("ctx"), col("w"))
        .agg(sum(col("cb")).as("cb"))
    val cu =
      if (cuGens.isEmpty) s.range(0).select(lit("").as("ctx"), col("id").as("cu"))
      else s.read.parquet(cuGens: _*).groupBy(col("ctx"))
        .agg(sum(col("cu")).as("cu"))
    val vocab =
      if (vGens.isEmpty) s.range(0).select(lit("").as("w"))
      else s.read.parquet(vGens: _*).select(col("w")).distinct()
    (cb, cu, vocab)
  }

  /** q155's serve point over the live state: score a wave of documents
    * `(doc_id, text)` — per doc `(n_tri, total_bits, n_unseen,
    * mbits_per_tri, flagged)`, the exact read-out (same scorer, same
    * gram derivation — [[graft.queries.PipelineQueries.lmScoreOver]]).
    */
  def score(s: SparkSession, lmDir: String, docs: DataFrame): DataFrame = {
    val (cb, cu, vocab) = state(s, lmDir)
    graft.queries.PipelineQueries.lmScoreOver(
      graft.queries.PipelineQueries.lmTrigrams(
        docs.select(col("doc_id"), col("text"))),
      cb, cu, vocab.count())
      .orderBy(col("doc_id"))
  }

  /** The compaction horizon (highest wave folded by [[compactLm]]), or
    * None if never compacted. As-of reads below it are
    * unreconstructible.
    */
  def compactionHorizon(s: SparkSession, lmDir: String): Option[Long] =
    GenStore.readHorizon(s, s"$lmDir/cb/_HORIZON")

  /** AUDIT-grade as-of scoring: [[score]]'s exact plan over the LM
    * state as of the END of wave `batchId` (generation partials at or
    * below it). Exact at or above the compaction horizon; throws below
    * it — compaction folds the per-wave partials into one generation,
    * so older points are gone.
    */
  def scoreAt(s: SparkSession, lmDir: String, docs: DataFrame,
      batchId: Long): DataFrame = {
    compactionHorizon(s, lmDir).foreach { h =>
      if (batchId < h)
        throw new IllegalArgumentException(
          s"scoreAt($batchId) is below the compaction horizon $h: " +
            "the generation partials needed to reconstruct it were compacted away")
    }
    val (cb, cu, vocab) = stateFor(s, lmDir,
      committedGens(s, lmDir, Some(batchId)))
    graft.queries.PipelineQueries.lmScoreOver(
      graft.queries.PipelineQueries.lmTrigrams(
        docs.select(col("doc_id"), col("text"))),
      cb, cu, vocab.count())
      .orderBy(col("doc_id"))
  }

  /** Digest-certified compaction: fold every committed generation of
    * each partial table into one (`gen=-1`, below any future batchId)
    * with a checked-rename swap (rename-back recovery for a crash
    * between the renames — the compactPairLog discipline). Certify by
    * total trigram mass (Σcb ≡ Σcu — both count every wave trigram
    * once) and vocabulary size read back from the sink's files. Counts
    * only add and nothing tombstones, so compaction is pure
    * re-aggregation; the recorded horizon exists for [[scoreAt]], which
    * cannot reconstruct per-wave points once the partials fold.
    */
  def compactLm(s: SparkSession, lmDir: String): Unit = {
    val f = hfs(s, lmDir)
    for (sub <- Seq("cb", "cu", "vocab")) {
      val live = new org.apache.hadoop.fs.Path(s"$lmDir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$lmDir/${sub}_old")
      if (!f.exists(live) && f.exists(old)) f.rename(old, live)
    }
    // ONE committed-wave listing feeds BOTH the fold and the horizon
    // (the single-listing rule): a generation is folded iff it is in
    // this list, and the horizon claims exactly these ids. Compaction
    // runs BETWEEN waves (the compactPairLog contract — maybeCompact's
    // slot in a serving loop); a wave committed concurrently would be
    // destroyed by the whole-dir swap, single listing or not.
    val gens = committedGens(s, lmDir)
    if (gens.isEmpty) return
    val (cb, cu, vocab) = stateFor(s, lmDir, gens)
    def mass(df: DataFrame, c: String): Long =
      df.agg(coalesce(sum(col(c)), lit(0L))).collect()(0).getLong(0)
    val (mb, mu, nv) = (mass(cb, "cb"), mass(cu, "cu"), vocab.count())
    if (mb != mu)
      throw new IllegalStateException(
        s"LM state inconsistent before compaction: sum(cb)=$mb != sum(cu)=$mu")
    cb.write.mode("overwrite").parquet(s"$lmDir/cb_compacting/gen=-1")
    cu.write.mode("overwrite").parquet(s"$lmDir/cu_compacting/gen=-1")
    vocab.write.mode("overwrite").parquet(s"$lmDir/vocab_compacting/gen=-1")
    // the compaction HORIZON rides the compacting dir so the swap
    // carries it atomically; scoreAt refuses points below it
    GenStore.writeHorizon(s, s"$lmDir/cb_compacting/_HORIZON",
      (gens ++ compactionHorizon(s, lmDir)).foldLeft(-1L)(math.max))
    for (sub <- Seq("cb", "cu", "vocab")) s.catalog.refreshByPath(s"$lmDir/${sub}_compacting")
    val backMb = mass(s.read.parquet(s"$lmDir/cb_compacting/gen=-1"), "cb")
    val backNv = s.read.parquet(s"$lmDir/vocab_compacting/gen=-1").count()
    if (backMb != mb || backNv != nv)
      throw new IllegalStateException(
        s"LM compaction digest mismatch: mass $mb->$backMb vocab $nv->$backNv")
    for (sub <- Seq("cb", "cu", "vocab")) {
      val live = new org.apache.hadoop.fs.Path(s"$lmDir/$sub")
      val old = new org.apache.hadoop.fs.Path(s"$lmDir/${sub}_old")
      val next = new org.apache.hadoop.fs.Path(s"$lmDir/${sub}_compacting")
      f.delete(old, true)
      if (!f.rename(live, old))
        throw new IllegalStateException(s"LM compaction: rename $live -> $old failed")
      if (!f.rename(next, live)) {
        f.rename(old, live)
        throw new IllegalStateException(s"LM compaction: rename $next -> $live failed")
      }
      f.delete(old, true)
      s.catalog.refreshByPath(live.toString)
    }
  }

  /** Start the LM maintainer over a streaming document frame
    * `(doc_id, text)` — one generation per micro-batch.
    */
  def start(docs: DataFrame, lmDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        updateBatch(lmDir)(b.toDF(), id); ()
      }
      .start()
}
