package graft.streaming

import org.apache.spark.sql.SparkSession

/** Shared generation-store plumbing for the wave-maintained services
  * (round-14 review: StreamingIndex, StreamingGraph, and StreamingLm
  * each grew a private copy of the _SUCCESS-gated generation lister and
  * the _HORIZON reader/writer — three copies means a fix to one drifts
  * from the others). One definition of:
  *  - what a COMMITTED generation is (`gen=<id>` dir carrying its
  *    `_SUCCESS` marker);
  *  - how the compaction horizon round-trips disk (a one-line `_HORIZON`
  *    file the compactor writes INSIDE the compacting dir so the
  *    checked-rename swap carries it atomically).
  *
  * Contract shared by every consumer: compaction runs BETWEEN waves
  * (the serving loop's maybeCompact slot — the compactPairLog rule), so
  * the generation listing a compactor captures at entry is the
  * complete fold set; the horizon must be computed from THAT listing,
  * never from a re-listing after the fold was materialized (a
  * concurrently-committed wave would be claimed folded and destroyed).
  */
private[streaming] object GenStore {

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sessionState.newHadoopConf())

  /** Committed generation ids under `root` (dirs `gen=<id>` carrying
    * the commit `marker`), ascending. The marker defaults to parquet's
    * own `_SUCCESS`; a MULTI-table wave must pass its single
    * wave-level commit marker instead (the StreamingLm `_WAVE` rule:
    * gating each table on its own `_SUCCESS` lets a torn wave be read
    * or compacted).
    */
  def completeGenIds(s: SparkSession, root: String,
      marker: String = "_SUCCESS"): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = fs(s, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen=") &&
        f.exists(new org.apache.hadoop.fs.Path(st.getPath, marker)))
      .map(_.getPath.getName.stripPrefix("gen=").toLong).sorted
  }

  /** Committed generation dirs under `root` with id ≤ `upTo` (all when
    * empty).
    */
  def completeGenDirs(s: SparkSession, root: String,
      upTo: Option[Long] = None): Seq[String] =
    completeGenIds(s, root)
      .filter(g => g <= upTo.getOrElse(Long.MaxValue))
      .map(g => s"$root/gen=$g")

  /** The `_HORIZON` marker at `path`, or None. */
  def readHorizon(s: SparkSession, path: String): Option[Long] = {
    val m = new org.apache.hadoop.fs.Path(path)
    val f = fs(s, path)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Write the `_HORIZON` marker (overwrite). */
  def writeHorizon(s: SparkSession, path: String, horizon: Long): Unit = {
    val out = fs(s, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(s"$horizon\n".getBytes("UTF-8")) finally out.close()
  }
}
