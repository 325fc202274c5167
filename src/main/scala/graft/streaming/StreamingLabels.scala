package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rolling duplicate-group labels at INGEST — the serving-side
  * counterpart of the batch q56 components and the maintenance twin of
  * q146: [[StreamingDedup]] emits verified near-dup pairs per
  * micro-batch, and this sink folds each wave into an on-disk label
  * table with [[graft.ops.Dedup.mergeLabels]] — compute bounded by the
  * WAVE (the reduced representative graph), never a full recompute.
  * This is the loop a rolling 100 TB dedup actually runs: q146 proves
  * the merge law once against a from-scratch oracle; here the same
  * operator runs wave-after-wave under streaming's at-least-once
  * delivery.
  *
  * Storage: each batch writes the FULL merged table under
  * `gen=<batchId>` and prunes older generations after success — readers
  * always see one complete generation, a replayed batch is skipped on
  * its `_SUCCESS` marker (and would be a no-op anyway: merging pairs
  * already inside one component relabels nothing — merge is idempotent
  * on replay, the StreamingIndex discipline). The REWRITE is
  * label-table-linear while the MERGE is wave-bounded; at real scale
  * the table would live partitioned on `pmod(id, P)` with only
  * partitions holding touched components rewritten — the compute side
  * (what this operator contributes) is unchanged by that storage
  * choice.
  */
object StreamingLabels {

  private def fs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())

  /** COMPLETE generations only — a dir without its `_SUCCESS` marker is
    * a crashed or in-flight write (overwrite mode even empties the dir
    * first), and exposing it would hand readers a partial label table;
    * they must fall back to the last complete generation instead.
    */
  private def gens(s: SparkSession, labelDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(labelDir)
    val f = fs(s, labelDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen=") &&
        f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
  }

  private def emptyLabels(s: SparkSession): DataFrame =
    s.range(0).select(col("id"), col("id").as("lbl"))

  /** The current label table `(id, lbl)` — the latest complete
    * generation, or an empty frame before the first wave lands.
    */
  def labels(s: SparkSession, labelDir: String): DataFrame =
    gens(s, labelDir).sorted.lastOption match {
      case Some(g) => s.read.parquet(s"$labelDir/gen=$g").select(col("id"), col("lbl"))
      case None => emptyLabels(s)
    }

  /** Fold one wave of verified pairs `(da, db)` into the label table:
    * merge against the latest generation STRICTLY BEFORE `batchId`
    * (a replayed batch must not merge into its own output), write the
    * merged table under `gen=<batchId>`, prune older generations.
    * Idempotent on the `_SUCCESS` marker exactly like
    * [[StreamingIndex.appendBatch]].
    */
  def mergeBatch(labelDir: String)(pairs: DataFrame, batchId: Long): Unit = {
    val s = pairs.sparkSession
    val dir = new org.apache.hadoop.fs.Path(s"$labelDir/gen=$batchId")
    val f = fs(s, labelDir)
    if (f.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) return
    val prior = gens(s, labelDir).filter(_ < batchId)
    val old = prior.sorted.lastOption match {
      case Some(g) => s.read.parquet(s"$labelDir/gen=$g").select(col("id"), col("lbl"))
      case None => emptyLabels(s)
    }
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame) = { locals += df.persist(); df }
    val wave = hold(pairs.select(col("da"), col("db")))
    graft.ops.Dedup.mergeLabels(old, wave, track = hold)
      .write.mode("overwrite").parquet(dir.toString)
    locals.foreach(_.unpersist(false))
    // prune superseded generations only after the new one is complete
    prior.foreach(g =>
      f.delete(new org.apache.hadoop.fs.Path(s"$labelDir/gen=$g"), true))
  }

  /** Start the label maintainer over a streaming verified-pair frame
    * (e.g. [[StreamingDedup.pairs]]' output).
    */
  def start(pairs: DataFrame, labelDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        mergeBatch(labelDir)(b.toDF(), id); ()
      }
      .start()
}
