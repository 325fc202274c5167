package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.streaming.StreamingDedup.DocSig

/** Streaming corpus materialization — the ONLINE twin of the q57 batch
  * funnel, i.e. the ingest service shape: documents arrive as a stream,
  * each is admitted or rejected against everything seen so far
  * (first-wins near-dup dedup), admitted docs pass the same quality
  * gate and deterministic stratified sample as q57, and survivors
  * append incrementally to lang-partitioned parquet.
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
  * At scale: one stateful shuffle keyed by (band, key) — the same key
  * the batch band join uses — with RocksDB-backed, cap-bounded bucket
  * state; the quality/sample predicates and the partitioned append are
  * stateless per-row work.
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
    * (witness semantics), bounded by the occupancy cap.
    */
  class AdmitProcessor extends StatefulProcessor[(Int, Long), AdmitObs, BandVerdict] {
    @transient private var members: ListState[DocSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[DocSig](
        "members", Encoders.product[DocSig], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long), rows: Iterator[AdmitObs],
        timers: TimerValues): Iterator[BandVerdict] = {
      val cap = graft.queries.TextQueries.BandOccCap
      val cohort = scala.collection.mutable.ArrayBuffer.empty[DocSig]
      members.get().foreach(cohort += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[BandVerdict]
      val fresh = scala.collection.mutable.ArrayBuffer.empty[DocSig]
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
    * document stream.
    */
  def verdicts(docs: DataFrame): Dataset[BandVerdict] = {
    import docs.sparkSession.implicits._
    val mods = graft.queries.TextQueries.SimhashMods
    docs.select(
        Seq(col("doc_id"), col("source"), col("lang"), col("text")) ++
          mods.zipWithIndex.map { case (m, b) =>
            graft.functions.SimHash16(col("text"), 31L, m).as(s"b$b") }: _*)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        explode(array(mods.indices.map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        col("source"), col("lang"), col("text"))
      .as[AdmitObs]
      .groupByKey(o => (o.band, o.key))
      .transformWithState(new AdmitProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Start the ingest: admitted docs (no band flagged dup) that pass
    * the q57 quality gate and stratified sample append to
    * `outDir/corpus` partitioned by lang. Returns the running query.
    */
  def ingest(docs: DataFrame, outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    verdicts(docs).writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[BandVerdict], _: Long) =>
        // all four band verdicts of a doc are produced in the same
        // micro-batch (stateless explode → one stateful op), so this
        // per-batch aggregation is complete for every doc it sees
        val admitted = batch.toDF()
          .groupBy(col("doc_id"))
          .agg(max(col("dup").cast("int")).as("any_dup"),
            first(col("source")).as("source"), first(col("lang")).as("lang"),
            first(col("text")).as("text"))
          .filter(col("any_dup") === 0)
          .filter(graft.ops.TextOps.qualityScore(col("text"))
            >= graft.queries.PipelineQueries.QualityThreshold)
          .filter(graft.queries.TextQueries.sampleHash < graft.queries.TextQueries.sampleRateBp)
          .select(col("doc_id"), col("source"), col("lang"), col("text"))
        admitted.write.mode("append").partitionBy("lang").parquet(s"$outDir/corpus")
        ()
      }
      .start()
  }
}
