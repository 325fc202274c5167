package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.streaming.StreamingDedup.DocSig

/** Streaming corpus materialization — the ONLINE twin of the q57 batch
  * funnel, i.e. the ingest service shape: documents arrive as a stream,
  * each is admitted or rejected against everything seen so far
  * (first-wins near-dup dedup), admitted docs pass the same quality
  * gate ([[graft.queries.PipelineQueries.qualityGate]] — scalar score
  * AND repetition, shared with the batch funnel so the two paths can
  * never gate differently) and deterministic stratified sample as q57,
  * and survivors append incrementally to lang-partitioned parquet.
  *
  * Online dedup semantics (deliberately different from batch q56, which
  * sees the whole graph): a document is REJECTED if any of its four
  * SimHash band buckets already holds a signature within Hamming ≤
  * [[graft.queries.TextQueries.SimhashMaxDist]]. Every arriving
  * signature joins its buckets (cap-bounded) whether admitted or not —
  * a rejected doc still WITNESSES its near-dup cluster, so later
  * members of the same cluster keep getting rejected even though the
  * doc that represents the cluster on disk arrived earlier (standard
  * online-clustering behavior; the transitive radius grows by one
  * verify distance per witness hop). Batches process each bucket's
  * arrivals in doc_id order, so a batch's outcome is independent of
  * shuffle order, and the whole stream's outcome equals a sequential
  * greedy scan in arrival order (StreamingCorpusSpec proves that
  * against a plain-Scala model).
  *
  * Restart safety: `foreachBatch` is at-least-once — a crash between
  * the parquet write and the checkpoint commit re-executes the batch on
  * restart. The sink is therefore IDEMPOTENT per batch: each micro-batch
  * writes to its own `batch_id=<id>` subdirectory (a partition column
  * for readers of `outDir/corpus`), skipped when that directory already
  * carries a `_SUCCESS` commit marker and OVERWRITTEN (not appended)
  * when a partial, marker-less write is left behind. Replayed batches
  * are bit-identical, which rests on two ordering guarantees — the
  * state store rewinds to the batch's start version, and admission
  * within the batch is deterministic because [[AdmitProcessor
  * .handleInputRows]] sorts each bucket's arrivals by doc_id before
  * scanning (Spark does NOT guarantee the group iterator's row order
  * across replays) and `ListState` preserves insertion order — so
  * skip-or-overwrite both land the exact committed content
  * (StreamingCorpusSpec kills the query after an uncommitted write and
  * asserts the restarted corpus has no duplicate doc_ids).
  *
  * At scale: one stateful shuffle keyed by (band, key) — the same key
  * the batch band join uses — with RocksDB-backed, cap-bounded bucket
  * state; the quality/sample predicates and the partitioned append are
  * stateless per-row work. Over an unbounded stream the number of live
  * buckets grows with distinct signatures: pass `stateTtl` to evict
  * buckets idle longer than the TTL (bounding state to the active
  * signature working set, at the cost of re-admitting a dup whose
  * cluster went idle past the TTL — the standard freshness/size trade;
  * PLANS.md round 4 states the bound).
  */
object StreamingCorpus {

  /** One banded observation carrying the doc payload (the payload rides
    * the single stateful shuffle ×4 bands — same volume class as the
    * batch pipeline's banded explode).
    */
  case class AdmitObs(band: Int, key: Long, doc_id: Long,
      b0: Long, b1: Long, b2: Long, b3: Long,
      source: String, lang: String, text: String)
  /** Per-band admit verdict with the payload passed through. */
  case class BandVerdict(doc_id: Long, band: Int, dup: Boolean,
      source: String, lang: String, text: String)

  private def dist(a: DocSig, b: DocSig): Int =
    java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
      java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)

  /** Bucket admitter: flags an arrival as dup iff its bucket cohort
    * already holds a near signature; appends the signature regardless
    * (witness semantics), bounded by the occupancy cap. `ttlMs > 0`
    * ages bucket members out of state (requires processing-time mode).
    */
  class AdmitProcessor(ttlMs: Long = 0L)
      extends StatefulProcessor[(Int, Long), AdmitObs, BandVerdict] {
    @transient private var members: ListState[DocSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[DocSig](
        "members", Encoders.product[DocSig],
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[AdmitObs],
        timers: TimerValues): Iterator[BandVerdict] = {
      val cap = graft.queries.TextQueries.BandOccCap
      val cohort = scala.collection.mutable.ArrayBuffer.empty[DocSig]
      members.get().foreach(cohort += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[BandVerdict]
      val fresh = scala.collection.mutable.ArrayBuffer.empty[DocSig]
      // sort is load-bearing for replay determinism: the group
      // iterator's row order is NOT guaranteed stable across replays
      rows.toArray.sortBy(_.doc_id).iterator.foreach { o =>
        val sig = DocSig(o.doc_id, o.b0, o.b1, o.b2, o.b3)
        val dup = cohort.exists(m => m.doc_id != sig.doc_id &&
          dist(m, sig) <= graft.queries.TextQueries.SimhashMaxDist)
        out += BandVerdict(o.doc_id, o.band, dup, o.source, o.lang, o.text)
        if (cohort.size < cap) { cohort += sig; fresh += sig }
      }
      if (fresh.nonEmpty) members.appendList(fresh.toArray)
      out.iterator
    }
  }

  /** Per-band admit verdicts for a `(doc_id, source, lang, text)`
    * document stream. `stateTtl` bounds bucket state on an unbounded
    * stream (switches the query to processing-time mode, which TTL
    * state requires); None keeps state forever — fine for bounded
    * replays and the correctness specs.
    */
  def verdicts(docs: DataFrame,
      stateTtl: Option[java.time.Duration] = None): Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    import graft.queries.TextQueries.{simhashBands, simhashSig}
    simhashBands(
        simhashSig(docs, carry = Seq("doc_id", "source", "lang", "text")),
        carry = Seq("doc_id", "source", "lang", "text", "b0", "b1", "b2", "b3"))
      .as[AdmitObs]
      .groupByKey(o => (o.band, o.key))
      .transformWithState(new AdmitProcessor(stateTtl.map(_.toMillis).getOrElse(0L)),
        if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Start the ingest: admitted docs (no band flagged dup) that pass
    * the shared quality gate and stratified sample land under
    * `outDir/corpus` as `batch_id=<n>/lang=<l>` parquet — the
    * idempotent per-batch commit described above. Returns the running
    * query. `onBatchCommitted` fires after a batch's files are in place
    * but before Spark commits the checkpoint (test seam for the
    * crash-between-write-and-commit window).
    */
  def ingest(docs: DataFrame, outDir: String, checkpoint: String,
      stateTtl: Option[java.time.Duration] = None,
      onBatchCommitted: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    verdicts(docs, stateTtl).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[BandVerdict], batchId: Long) =>
        // all four band verdicts of a doc are produced in the same
        // micro-batch (stateless explode → one stateful op), so this
        // per-batch aggregation is complete for every doc it sees
        val admitted = batch.toDF()
          .groupBy(col("doc_id"))
          .agg(max(col("dup").cast("int")).as("any_dup"),
            first(col("source")).as("source"), first(col("lang")).as("lang"),
            first(col("text")).as("text"))
          .filter(col("any_dup") === 0)
          .filter(graft.queries.PipelineQueries.qualityGate(col("text")))
          .filter(graft.queries.TextQueries.sampleHash < graft.queries.TextQueries.sampleRateBp)
          .select(col("doc_id"), col("source"), col("lang"), col("text"))
        val dir = new org.apache.hadoop.fs.Path(s"$outDir/corpus/batch_id=$batchId")
        val fs = dir.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
        if (fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
          // replayed batch already fully committed on disk: skip the
          // rewrite, but still drive the stateful plan — the state
          // stores must advance to this batch's version (Spark validates
          // every batch commits its state)
          batch.foreachPartition((it: Iterator[BandVerdict]) => it.foreach(_ => ()))
        else
          // a marker-less leftover from a crash mid-write is overwritten
          admitted.write.mode("overwrite").partitionBy("lang").parquet(dir.toString)
        onBatchCommitted(batchId)
        ()
      }
      .start()
  }
}
