package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Incremental batch dedup against a FROZEN corpus snapshot — the
  * production shape a pipeline owner hits first: a new crawl arrives
  * and must be checked against an existing deduped corpus WITHOUT
  * recomputing the old side. The [[Ivf]] build/probe split applied to
  * q51's banded SimHash machinery:
  *
  *  - [[buildIndex]] runs ONCE over the snapshot and emits a
  *    self-contained signature index (persist it as parquet alongside
  *    the corpus);
  *  - [[probe]] hashes ONLY the new batch and joins its band keys
  *    against the loaded index — the snapshot's text never loads again.
  *
  * The index is self-contained the way [[Ivf]]'s assignments are (the
  * round-4 double-scan fix): every band row carries the full 4×16-bit
  * signature, so verification reads the matched index rows themselves —
  * no second join back to a signature table, and no text column at all
  * (the schema makes rebuilding IMPOSSIBLE for the probe, not merely
  * avoided).
  *
  * At 100 TB: the index is 4 rows × ~50 bytes per snapshot doc,
  * hash-partitioned on (band, key) — the probe is one equi-join whose
  * build side is the NEW BATCH (small), plus the verify filter. Per
  * (band, key) the fan-out is batch-members × min(occ, cap): the
  * snapshot side carries q51's occupancy cap ([[TextQueries.BandOccCap]],
  * applied at build time over the snapshot), so a pathological bucket
  * costs each new doc at most `cap` comparisons — linear in the batch,
  * never quadratic in the corpus.
  */
object IncrementalDedup {

  /** Build the frozen signature index: one row per (doc, band) —
    * `(doc_id, b0, b1, b2, b3, band, key)` — with over-occupied buckets
    * dropped exactly like q51's self-join (they are byte-near-identical
    * mass that exact dedup catches; dropping them at BUILD time means
    * every future probe inherits the skew protection). `track` lets
    * callers register the internally re-read frame for cache release
    * (invariant 6); pass-through by default.
    */
  def buildIndex(docs: DataFrame,
      track: DataFrame => DataFrame = identity): DataFrame = {
    // the ONE fingerprint definition (TextQueries.simhashSig) — the
    // frozen index can never desynchronize from the full recompute
    val banded = track(TextQueries.simhashBands(
      TextQueries.simhashSig(docs),
      carry = Seq("doc_id", "b0", "b1", "b2", "b3")))
    TextQueries.bandOccCapped(banded)
  }

  /** Probe a new batch against a built (or parquet-loaded) index:
    * verified near-dup matches `(new_id, old_id, dist)` with
    * `dist ≤ SimhashMaxDist`, one row per matched (new, old) pair even
    * when several bands collide. Only `newDocs` is hashed; the index
    * side is consumed as-is.
    */
  def probe(index: DataFrame, newDocs: DataFrame): DataFrame = {
    val nb = TextQueries.simhashBands(
        TextQueries.simhashSig(newDocs, prefix = "nb"), prefix = "nb",
        carry = Seq("doc_id", "nb0", "nb1", "nb2", "nb3"))
      .withColumnRenamed("doc_id", "new_id")
    val idx = index.select(col("doc_id").as("old_id"),
      col("b0"), col("b1"), col("b2"), col("b3"), col("band"), col("key"))
    nb.join(idx, Seq("band", "key"))
      .withColumn("dist", TextQueries.simhashDist("nb", "b"))
      .filter(col("dist") <= TextQueries.SimhashMaxDist)
      .select(col("new_id"), col("old_id"), col("dist"))
      .distinct()
  }
}
