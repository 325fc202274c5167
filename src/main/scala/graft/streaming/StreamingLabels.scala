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
  * Storage is PARTITIONED so the write is wave-bounded too (round-10's
  * one named 100 TB gap — the merge compute was already delta-sized but
  * every wave rewrote the whole table): ids hash into `P` fixed buckets
  * (`pmod(id, P)`, pinned in `_partitions` at first write so a caller
  * changing the default cannot split the table), and each wave writes
  * `gen=<batchId>/part=<b>/` for ONLY the buckets holding a changed or
  * fresh id — an untouched bucket's files are not reopened, not
  * rewritten, byte-identical across the wave (spec-asserted). The
  * current table is, per bucket, the newest COMPLETE generation
  * carrying that bucket; a generation dir without its `_SUCCESS` marker
  * is a crashed or in-flight write and stays invisible. Replayed
  * batches are skipped on the marker (and would be a no-op anyway:
  * merging pairs already inside one component relabels nothing — merge
  * is idempotent on replay, the StreamingIndex discipline).
  *
  * Superseded generations retire in TWO steps (the lazy-reader grace
  * window): a generation whose every bucket has a newer complete copy
  * is first stamped `_RETIRED` by the wave that finds it superseded and
  * only DELETED by a later wave — so a lazy `labels()` frame obtained
  * before wave W stays readable until wave W+1 completes, and callers
  * that hold results across more than one wave must materialize them
  * (localCheckpoint/collect) — documented contract, spec-driven.
  * Generations that remain latest-for-some-bucket are never touched, so
  * at most P generations are live at once plus the one-wave retirement
  * tail.
  */
object StreamingLabels {

  /** Default id-bucket count. At 100 TB this would be thousands; the
    * value only shapes write granularity (pinned per table on first
    * write), never results.
    */
  val DefaultParts: Int = 16

  private def hfs(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())

  private def path(parts: String*) =
    new org.apache.hadoop.fs.Path(parts.mkString("/"))

  /** COMPLETE generations only — a dir without its `_SUCCESS` marker is
    * a crashed or in-flight write (overwrite mode even empties the dir
    * first), and exposing it would hand readers a partial label table;
    * they must fall back to the last complete generation instead.
    */
  private def gens(s: SparkSession, labelDir: String): Seq[Long] = {
    val p = path(labelDir)
    val f = hfs(s, labelDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen=") &&
        f.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
  }

  private def partsOf(s: SparkSession, labelDir: String, g: Long): Seq[String] = {
    val f = hfs(s, labelDir)
    f.listStatus(path(labelDir, s"gen=$g")).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("part="))
      .map(_.getPath.getName)
  }

  private def emptyLabels(s: SparkSession): DataFrame =
    s.range(0).select(col("id"), col("id").as("lbl"))

  /** The label table as of the complete generations strictly before
    * `before` (all of them when `before` is empty): per bucket, the
    * newest generation carrying it. Reading the `part=` leaf dirs
    * directly keeps the schema at `(id, lbl)` — no partition column is
    * inferred for the roots themselves.
    */
  private def labelsAsOf(s: SparkSession, labelDir: String,
      before: Option[Long]): DataFrame = {
    val gs = gens(s, labelDir).filter(g => before.forall(g < _)).sorted
    // newest gen per bucket: ascending fold, later gens overwrite
    val latest = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for (g <- gs; p <- partsOf(s, labelDir, g)) latest(p) = g
    if (latest.isEmpty) emptyLabels(s)
    else s.read.parquet(
        latest.map { case (p, g) => s"$labelDir/gen=$g/$p" }.toSeq: _*)
      .select(col("id"), col("lbl"))
  }

  /** The current label table `(id, lbl)` — per bucket, the newest
    * complete generation; empty before the first wave lands. The frame
    * is lazy over the current files: it stays readable across the NEXT
    * wave (retirement is two-step), but callers holding it longer must
    * materialize it first.
    */
  def labels(s: SparkSession, labelDir: String): DataFrame =
    labelsAsOf(s, labelDir, None)

  /** The table's pinned bucket count: written once by the first wave,
    * read back (ignoring the caller's value) ever after — two writers
    * disagreeing on P must not split one table across two bucketings.
    */
  private def pinnedParts(s: SparkSession, labelDir: String, want: Int): Int = {
    val f = hfs(s, labelDir)
    val meta = path(labelDir, "_partitions")
    if (f.exists(meta)) {
      val in = f.open(meta)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    } else {
      f.mkdirs(path(labelDir))
      val out = f.create(meta, true)
      try out.write(s"$want\n".getBytes("UTF-8")) finally out.close()
      want
    }
  }

  /** Fold one wave of verified pairs `(da, db)` into the label table:
    * merge against the per-bucket-latest generations STRICTLY BEFORE
    * `batchId` (a replayed batch must not merge into its own output),
    * write ONLY the buckets holding a changed or fresh id under
    * `gen=<batchId>/part=<b>`, then retire fully-superseded
    * generations (two-step, see the scaladoc). Idempotent on the
    * `_SUCCESS` marker exactly like [[StreamingIndex.appendBatch]].
    */
  def mergeBatch(labelDir: String, parts: Int = DefaultParts)(
      pairs: DataFrame, batchId: Long): Unit = {
    val s = pairs.sparkSession
    val f = hfs(s, labelDir)
    val genDir = path(labelDir, s"gen=$batchId")
    if (f.exists(new org.apache.hadoop.fs.Path(genDir, "_SUCCESS"))) return
    val p = pinnedParts(s, labelDir, parts)
    val locals = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame) = { locals += df.persist(); df }
    val old = hold(labelsAsOf(s, labelDir, Some(batchId)))
    val wave = hold(pairs.select(col("da"), col("db")))
    // persisted: the touched-bucket probe and the bucket-filtered write
    // both read the merged table (invariant 6)
    val merged = hold(graft.ops.Dedup.mergeLabels(old, wave, track = hold)
      .withColumn("part", pmod(col("id"), lit(p.toLong))))
    // buckets that must rewrite: any holding a fresh id or a relabel.
    // Driver-side list is bounded by P (a scalar per bucket, not rows).
    val touched = merged
      .join(old.withColumnRenamed("lbl", "old_lbl"), Seq("id"), "left")
      .filter(col("old_lbl").isNull || col("old_lbl") =!= col("lbl"))
      .select(col("part")).distinct()
      .collect().map(_.getLong(0)).sorted
    // a whole touched bucket rewrites (files are immutable — unchanged
    // rows sharing the bucket ride along); untouched buckets are never
    // read by this write, never reopened, never rewritten
    merged.filter(if (touched.isEmpty) lit(false)
        else col("part").isin(touched.map(java.lang.Long.valueOf): _*))
      .write.mode("overwrite").partitionBy("part").parquet(genDir.toString)
    locals.foreach(_.unpersist(false))
    retireSuperseded(s, labelDir, batchId)
  }

  /** Two-step retirement: a complete generation whose every bucket has
    * a newer complete copy is stamped `_RETIRED` on the first wave that
    * observes it superseded, and deleted by any LATER wave that finds
    * the stamp — never the stamping wave itself, so lazy readers from
    * before the superseding wave get one full wave to materialize.
    */
  private def retireSuperseded(s: SparkSession, labelDir: String,
      batchId: Long): Unit = {
    val f = hfs(s, labelDir)
    val gs = gens(s, labelDir).sorted
    val newerParts = scala.collection.mutable.HashSet.empty[String]
    // walk newest→oldest; a gen is superseded iff all its parts appear
    // in strictly newer complete gens (an empty no-op gen is trivially
    // superseded)
    for (g <- gs.reverse) {
      val ps = partsOf(s, labelDir, g)
      val superseded = ps.forall(newerParts.contains)
      if (superseded) {
        val stamp = path(labelDir, s"gen=$g", "_RETIRED")
        if (!f.exists(stamp)) {
          val out = f.create(stamp, true)
          try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
        } else {
          val in = f.open(stamp)
          val by = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
            finally in.close()
          if (by < batchId) f.delete(path(labelDir, s"gen=$g"), true)
        }
      }
      ps.foreach(newerParts.add)
    }
  }

  /** Start the label maintainer over a streaming verified-pair frame
    * (e.g. [[StreamingDedup.pairs]]' output).
    */
  def start(pairs: DataFrame, labelDir: String, checkpoint: String,
      parts: Int = DefaultParts)
      : org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        mergeBatch(labelDir, parts)(b.toDF(), id); ()
      }
      .start()
}
