package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.queries.PipelineQueries

/** Streaming maintenance of the q84 count-min sketch — the payoff of
  * choosing a MERGEABLE-BY-ADDITION sketch: the streaming form is a
  * plain streaming aggregation (no custom state processor at all),
  * because incrementally summing per-batch counter deltas IS the CMS
  * merge. The counter table stays 4·CmsWidth rows forever, so complete
  * output mode is bounded regardless of stream length.
  *
  * One bucket definition ([[PipelineQueries.cmsBuckets]]) and one gram
  * hash (dual-residue ShingleHash) are shared with the batch query, so
  * the streaming sketch can never drift from the batch sketch —
  * StreamingSketchSpec proves counters after N waves ≡ the batch
  * counters over the union of the waves.
  */
object StreamingSketch {

  /** CMS counters `(r, bucket, cnt)` over a (streaming or batch)
    * `docs(doc_id, text)` frame. On a stream, run with complete output
    * mode: each micro-batch's gram placements hash-aggregate into the
    * running counters map-side first (partial sums), exactly the batch
    * plan's shape.
    */
  def cmsCounters(docs: DataFrame): DataFrame =
    PipelineQueries.gramKeys(docs)
      .select(PipelineQueries.cmsBuckets(col("g")).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-source KMV state `(source, minhashes)` over a (streaming or
    * batch) `docs(source, text)` frame — q83's sketch maintained by the
    * [[graft.ops.Aggregators.MinK]] typed aggregator: its `merge` is
    * the KMV union, so map-side partials ARE the distributed sketch
    * merge and complete-mode streaming keeps exactly k longs of state
    * per source. The batch q83 window form and this aggregate form
    * must produce the same k-th hash (StreamingSketchSpec).
    */
  /** Bloom bitset words `(w, bits)` over a (streaming or batch)
    * `docs(doc_id, text)` frame — q88's filter maintained as ONE
    * complete-mode aggregation. The stream skips q88's per-doc
    * `distinct` on purpose: OR is idempotent, so duplicate gram
    * arrivals cannot change a bit, and chaining a distinct would be a
    * second streaming aggregation (unsupported) for nothing. The batch
    * build over distinct keys and this duplicate-tolerant form produce
    * the identical bitset (StreamingSketchSpec proves it per wave).
    */
  def bloomWords(docs: DataFrame): DataFrame =
    PipelineQueries.bloomWords(
      PipelineQueries.gramKeys(docs).withColumnRenamed("g", "h"))

  /** The q89 priority-sampling reservoir `(priority, doc_id, n_tokens)`
    * maintained over a (streaming or batch) `docs(doc_id, source,
    * text)` frame by [[graft.ops.Aggregators.TopPriority]]: the
    * reservoir is the top-(k+1) rows by priority, whose union law
    * (keep the k+1 best of both) is the aggregator's `merge` — so
    * complete-mode streaming keeps exactly k+1 rows of state forever
    * and equals the batch global top-(k+1) after every wave. The draw
    * and the priority are [[PipelineQueries.priorityRows]], shared
    * with the batch query, so the two cannot drift. The k+1-th row is
    * τ; rows 1..k are the sample — exactly q89's read-out.
    */
  def prioritySampleState(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    PipelineQueries.priorityRows(docs)
      .select(col("priority"), col("doc_id"), col("n_tokens"))
      .as[(Double, Long, Long)]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(graft.ops.Aggregators.TopPriority(PipelineQueries.PriorityK + 1)
        .toColumn.name("reservoir"))
      .toDF("g", "reservoir")
      .select(col("reservoir"))
  }

  /** q111's algebraic partials maintained as a streaming aggregation:
    * per-source (n_docs, sum_tokens, min_nc, max_nc) over a (streaming
    * or batch) `docs(source, text, n_chars)` frame. Counts and sums
    * add, min/max fold — every stat is mergeable, so complete-mode
    * state is |sources| rows forever and the nightly-merge discipline
    * (q111) and the always-on stream are the SAME aggregation plan.
    * StreamingSketchSpec proves state ≡ batch recompute after every
    * wave.
    */
  def sourceStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"),
        min(col("n_chars")).as("min_nc"), max(col("n_chars")).as("max_nc"))

  /** Per-group HDR quantile-sketch state `(grp, bins)` over a
    * (streaming or batch) `(grp, vc)` frame — q119's sketch maintained
    * by [[graft.ops.Aggregators.HdrHist]]: `merge` is bin-count
    * addition (the sketch union), so complete-mode streaming keeps
    * ≤ 64·HdrSub counters per group forever and equals the batch
    * sketch after every wave (StreamingSketchSpec). Quantile read-out
    * is [[graft.ops.Aggregators.HdrBins.quantileLo]], the same math
    * q119's SQL computes in-plan.
    */
  def hdrState(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("grp"), col("vc"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.ops.Aggregators.HdrHist(PipelineQueries.HdrSub).toColumn.name("bins"))
      .toDF("grp", "bins")
  }

  /** First-seen-wave gram state `(g, first_batch)` over a (streaming
    * or batch) `(batch_id, text)` frame — q120's first-occurrence
    * novelty maintained online: ONE complete-mode min-aggregation per
    * distinct gram (min is mergeable, so map-side partials and wave
    * re-aggregation are exact), and the per-wave read-out
    * `groupBy(first_batch).count` IS the novelty curve an ingestion
    * monitor alarms on ("this crawl added almost nothing new").
    * State is the distinct-gram table; at 100 TB the same read-out
    * runs over a KMV/Bloom-bounded state instead (the q83/q88
    * swap, documented not implemented — min-exactness is the twin
    * contract here). NoveltySpec proves wave ≡ batch prefix.
    */
  def gramFirstSeen(docs: DataFrame): DataFrame =
    docs.select(col("batch_id"),
        explode(array_distinct(graft.functions.ShingleHash(
          col("text"), TextOps.P, 3, TextOps.P2))).as("g"))
      .groupBy(col("g")).agg(min(col("batch_id")).as("first_batch"))

  /** q123's A/B moment matrix maintained as a streaming aggregation:
    * per (event_type, arm), the exact integer moments (n, Σv, Σv² —
    * the square sum in decimal(38), as in q123: a long Σv² wraps at
    * ~4e9 rows per arm) over a (streaming or batch) `(event_type, arm,
    * vc)` frame. Counts and sums add, so complete-mode state is
    * 2·|types| rows forever and the live experiment dashboard reads
    * the same z-statistic expressions q123 computes in batch — a
    * readout is a pure function of this state (AbReadoutSpec proves
    * wave ≡ batch).
    */
  def abState(rows: DataFrame): DataFrame =
    rows.groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("s"),
        sum((col("vc") * col("vc")).cast("decimal(38,0)")).as("ss"))

  def kmvState(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    PipelineQueries.sourceGramKeys(docs)
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.ops.Aggregators.MinK(PipelineQueries.KmvK).toColumn.name("minhashes"))
      .toDF("source", "minhashes")
  }

  /** q116's per-(source, token-length) histogram maintained as ONE
    * complete-mode aggregation over a (streaming or batch)
    * `docs(source, text)` frame — per-batch count deltas summing into
    * the running histogram IS the histogram merge, state is bounded by
    * |sources|·|distinct lengths| (value-domain-sized, never
    * corpus-sized), and the drift monitor's readout is the SAME
    * [[PipelineQueries.ksFromHist]] the batch query runs
    * (StreamingDriftSpec proves wave ≡ batch ≡ q116) — distribution
    * drift alarms are naturally streaming, and this is the whole
    * streaming side of one.
    */
  def lengthHist(docs: DataFrame): DataFrame =
    PipelineQueries.lengthHist(docs)

  /** q128's per-label centroid MOMENTS `(label, S, n)` maintained over
    * a (streaming or batch) `vecs(label, vq)` frame (vq = the ⌊x·10⁶⌋
    * long vector) by [[graft.ops.Aggregators.LongVecSum]] — the vector
    * sums are additive, so per-batch partials merging into the running
    * state IS the centroid update, and complete-mode output stays
    * |labels| rows forever. A live outlier monitor reconstructs the
    * centroid (CAST(S AS DOUBLE)/(10⁶·n)) and scores arrivals against
    * it with the same fixed-association d² as the batch query;
    * CentroidSpec proves wave ≡ batch on every prefix.
    */
  def centroidState(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs.select(col("label"), col("vq"))
      .as[(Int, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.ops.Aggregators.LongVecSum.toColumn)
      .toDF("label", "sn")
      .select(col("label"), col("sn._1").as("S"), col("sn._2").as("n"))
  }
}
