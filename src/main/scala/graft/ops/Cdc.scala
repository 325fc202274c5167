package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rolling-hash chunker behind
  * CDC-style storage dedup — Muthitacharoen, Chen & Mazières, "A
  * Low-Bandwidth Network File System", SOSP 2001): a chunk boundary
  * falls wherever the rolling window hash of the last `w` tokens is ≡ 0
  * (mod `divisor`), so boundaries are anchored to CONTENT, not to
  * offsets — an insertion shifts every downstream token, desynchronizes
  * every fixed-size chunk after it, but CDC boundaries re-lock on the
  * first unchanged window and the tail chunks hash identically again.
  *
  * Measured context (PLANS.md round 8): on THIS corpus CDC is vacuous —
  * the synthetic near-dups are scattered substitutions, never
  * insertions, so the resync advantage never fires (dup-chunk rate
  * 5.6% CDC vs 6.5% fixed at sf0.01) — which is why the operator is
  * spec-gated rather than oracled: CdcSpec proves the resync property
  * on a deterministic insertion fixture (the dormant-branch discipline)
  * and the partition invariants on the real corpus.
  *
  * Implementation is one row per document, pure codegen HOFs (no UDF,
  * no mapPartitions): the window hashes are [[graft.functions.ShingleHash]]'s
  * positional gram array (the same dual-residue expression the dedup
  * family uses), boundary selection and chunk assembly are
  * transform/filter over it. At 100 TB the op is embarrassingly
  * row-parallel; the downstream chunk-hash groupBy is the same shuffle
  * class as q99's fixed chunking.
  */
object Cdc {

  /** Per-doc content-defined chunks:
    * `(doc_id, chunk_ix, lo, hi, n_tokens, h)` where `[lo, hi]` are
    * 1-based token bounds partitioning the document exactly and `h` is
    * sha256 of the space-joined chunk text. A gram STARTING at 0-based
    * window position i (covering tokens i+1..i+w) whose packed hash is
    * ≡ 0 (mod divisor) ends a chunk at token i+w; the document end
    * always closes the final chunk.
    */
  def chunks(docs: DataFrame, w: Int, divisor: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val hs = graft.functions.ShingleHash(col(textCol), TextOps.P, w, TextOps.P2)
    // boundary token positions (1-based ends), always including the
    // document end; transform-with-index avoids the descending
    // sequence(1, n) trap on short docs (n < w ⇒ empty gram array)
    val ends = array_sort(array_distinct(concat(
      filter(
        transform(hs, (x, i) => when(pmod(x, lit(divisor)) === 0, i + lit(w))
          .otherwise(lit(-1))),
        e => e > 0),
      array(size(toks).cast("int")))))
    docs.select(col(idCol).as("doc_id"), toks.as("toks"), ends.as("ends"))
      .select(col("doc_id"), col("toks"),
        posexplode(transform(col("ends"), (e, j) =>
          struct(
            when(j === 0, lit(1))
              .otherwise(element_at(col("ends"), j) + 1).as("lo"),
            e.as("hi")))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_ix"),
        col("col.lo").as("lo"), col("col.hi").as("hi"),
        (col("col.hi") - col("col.lo") + 1).cast("long").as("n_tokens"),
        sha2(array_join(
          slice(col("toks"), col("col.lo"), col("col.hi") - col("col.lo") + 1), " "),
          256).as("h"))
  }

  /** Fixed-size chunking with the same output shape — the comparator
    * CDC is measured against (non-overlapping `w`-token windows).
    */
  def fixedChunks(docs: DataFrame, w: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("nc", expr(s"(size(toks) - 1) div $w"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("nc"))).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix").cast("int").as("chunk_ix"),
        (col("chunk_ix") * w + 1).as("lo"),
        least(col("chunk_ix") * w + lit(w), size(col("toks"))).as("hi"),
        (least(col("chunk_ix") * w + lit(w), size(col("toks")))
          - col("chunk_ix") * w).cast("long").as("n_tokens"),
        sha2(array_join(slice(col("toks"), col("chunk_ix") * w + 1, lit(w)), " "), 256)
          .as("h"))

  /** Duplicate-chunk rate: the share of chunk INSTANCES whose hash
    * occurs more than once corpus-wide — the storage/dedup win a
    * chunking scheme buys. One hash agg + one scalar row.
    */
  def dupChunkRate(chunks: DataFrame): Double = {
    val r = chunks.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"),
        sum(col("c")).as("total"))
      .collect()(0)
    if (r.getLong(1) == 0L) 0.0 else r.getLong(0).toDouble / r.getLong(1).toDouble
  }
}
