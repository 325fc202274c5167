package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIndex

/** The q92 streaming twin's contract: appending the new generation's
  * vectors through a STREAM (frozen quantizers, foreachBatch code
  * appends) must (a) leave the old generation's code files and rows
  * byte/row-invariant, (b) make the on-disk search reproduce the batch
  * q92 output exactly, and (c) stay idempotent under a replayed batch
  * (the at-least-once window).
  */
class StreamingIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("stream-appended index == batch q92; old codes invariant; replay idempotent") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val cut = StreamingIndex.buildFrozen(spark, d, dir)

    def oldFiles(): Seq[(String, Long)] = {
      val p = new java.io.File(s"$dir/codes/gen=-1")
      p.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length)).toSeq.sorted
    }
    // order-independent row digest of the old generation's codes
    def oldDigest(): Long = spark.read.parquet(s"$dir/codes")
      .filter(col("gen") === -1)
      .agg(sum(hash(col("vec_id"), col("m"), col("cid"), col("cell")).cast("long")))
      .collect()(0).getLong(0)
    val files0 = oldFiles()
    val digest0 = oldDigest()
    assert(files0.nonEmpty)

    // stream the new generation in three waves
    val newVecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= cut)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    assert(newVecs.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sidx_ckpt").toString
    val q = StreamingIndex.appendStream(
      source.toDS().toDF("vec_id", "embedding"), dir, ckpt)
    try {
      for (chunk <- newVecs.grouped((newVecs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // (a) old generation untouched — same files, same bytes, same rows
    assert(oldFiles() === files0)
    assert(oldDigest() === digest0)

    // (b) on-disk search reproduces batch q92 bit-for-bit
    val streamed = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq
    val batch = SparkEntry.queries("q92_index_append")(spark, d).collect().toSeq
    assert(streamed === batch)
    assert(streamed.exists(_.getAs[Boolean]("is_new")),
      "no new-generation vector in the top-k — the append branch is dormant")

    // (c) a replayed batch is skipped (idempotent): re-running batch 0's
    // append over garbage rows must be a no-op because its _SUCCESS exists
    val garbage = spark.range(1).select(lit(999999L).as("vec_id"),
      typedLit(Seq.fill(64)(0.5f)).as("embedding"))
    StreamingIndex.appendBatch(dir)(garbage, 0L)
    val streamed2 = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq
    assert(streamed2 === batch)

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("delete tombstones + digest-certified compaction: the other half of the lifecycle") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx_del").toString
    val cut = StreamingIndex.buildFrozen(spark, d, dir)
    // append the whole new generation in one direct batch (the stream
    // wiring is the previous test's subject)
    val newVecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= cut).select(col("vec_id"), col("embedding"))
    StreamingIndex.appendBatch(dir)(newVecs, 0L)
    val nTotal = spark.read.parquet(s"$d/embeddings.parquet").count()

    // pre-delete rankings, deep enough to predict the post-delete top-5
    val pre20 = StreamingIndex.searchTopK(spark, d, dir, k = 20).collect()
    // delete one old-gen and one new-gen id that actually appear in
    // results, plus one absent id — all three branches live
    val inResults = pre20.map(_.getAs[Long]("vec_id")).distinct
    val delOld = inResults.filter(_ < cut).head
    val delNew = inResults.filter(_ >= cut).head
    val absent = (0L until nTotal).find(id => !inResults.contains(id)).get
    StreamingIndex.deleteBatch(dir)(Seq(delOld, absent).toDF("vec_id"), 0L)
    StreamingIndex.deleteBatch(dir)(Seq(delNew).toDF("vec_id"), 1L)
    val deleted = Set(delOld, delNew, absent)

    // promotion law: with the shortlist at 20 and ≤2 deletions per
    // query, the post-delete top-5 is exactly the first 5 surviving
    // pre-delete rows per query (relative ADC/d2 order is untouched)
    val post = StreamingIndex.searchTopK(spark, d, dir).collect()
    assert(post.forall(r => !deleted.contains(r.getAs[Long]("vec_id"))))
    val expect = pre20.groupBy(_.getAs[Long]("query_id")).view.mapValues(
      _.sortBy(_.getAs[Int]("rank"))
        .filterNot(r => deleted.contains(r.getAs[Long]("vec_id")))
        .take(5).map(_.getAs[Long]("vec_id")).toSeq).toMap
    val got = post.groupBy(_.getAs[Long]("query_id")).view.mapValues(
      _.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq).toMap
    assert(got === expect)

    // idempotent replay: re-running delete gen 0 with garbage is a no-op
    StreamingIndex.deleteBatch(dir)(Seq(0L, 1L, 2L).toDF("vec_id"), 0L)
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === post.toSeq)

    // compaction: same search, tombstones gone, codes = live rows only
    StreamingIndex.compact(spark, dir)
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === post.toSeq)
    assert(!new java.io.File(s"$dir/tombs").exists())
    val codesRows = spark.read.parquet(s"$dir/codes").count()
    // absent was tombstoned too and IS a real vector — 3 ids dropped
    assert(codesRows === (nTotal - 3) * graft.ops.Pq.M)

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("compaction policy: generation-count and tombstone-ratio triggers, search-invariant") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx_pol").toString
    val cut = StreamingIndex.buildFrozen(spark, d, dir)
    assert(!StreamingIndex.compactionDue(spark, dir),
      "fresh single-generation index must not be due")

    // fragment the new generation into 10 append batches → 11 gen dirs
    val newVecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= cut).select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val chunks = newVecs.grouped((newVecs.length + 9) / 10).toSeq
    for ((c, i) <- chunks.zipWithIndex)
      StreamingIndex.appendBatch(dir)(c.toDF("vec_id", "embedding"), i.toLong)
    def gens(): Int = new java.io.File(s"$dir/codes").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("gen="))
    assert(gens() === chunks.length + 1)
    assert(StreamingIndex.compactionDue(spark, dir, maxGens = 8),
      "generation-count trigger dormant")
    assert(!StreamingIndex.compactionDue(spark, dir, maxGens = 64),
      "due with a loose gen bound and no tombstones — ratio math is off")

    val pre = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq
    assert(StreamingIndex.maybeCompact(spark, dir, maxGens = 8),
      "maybeCompact declined a due index")
    assert(gens() === 1, "compaction did not collapse the generation dirs")
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === pre)
    assert(!StreamingIndex.compactionDue(spark, dir, maxGens = 8))

    // tombstone-ratio trigger: one deleted id among hundreds stays below
    // the default 25% watermark (no-op), a third of all ids crosses it
    val nIds = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id")).distinct().count()
    StreamingIndex.deleteBatch(dir)(Seq(0L).toDF("vec_id"), 0L)
    assert(!StreamingIndex.maybeCompact(spark, dir, maxGens = 8),
      "ratio trigger fired below the watermark")
    assert(new java.io.File(s"$dir/tombs").exists(),
      "below-watermark maybeCompact must leave tombstones in place")
    StreamingIndex.deleteBatch(dir)(
      (0L until nIds / 3).toDF("vec_id"), 1L)
    val preDel = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq
    assert(StreamingIndex.maybeCompact(spark, dir, maxGens = 8),
      "ratio trigger dormant at a third of ids tombstoned")
    assert(!new java.io.File(s"$dir/tombs").exists())
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === preDel)

    // crash-window recovery: simulate a hard crash between the two swap
    // renames (codes moved aside, replacement not yet in place) — the
    // next compact() must restore the old table and complete normally
    assert(new java.io.File(s"$dir/codes")
      .renameTo(new java.io.File(s"$dir/codes_old")))
    StreamingIndex.compact(spark, dir)
    assert(new java.io.File(s"$dir/codes").exists())
    assert(!new java.io.File(s"$dir/codes_old").exists())
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === preDel,
      "post-recovery search diverged")

    // the same crash state must also self-heal through the POLICY path:
    // a serving loop drives recovery purely via maybeCompact, and
    // codes_old-without-codes must read as DUE (not "nothing built") or
    // the index stays unreadable until someone calls compact() directly
    assert(new java.io.File(s"$dir/codes")
      .renameTo(new java.io.File(s"$dir/codes_old")))
    assert(StreamingIndex.compactionDue(spark, dir, maxGens = 8),
      "mid-swap crash state not reported as due")
    assert(StreamingIndex.maybeCompact(spark, dir, maxGens = 8),
      "maybeCompact declined the mid-swap crash state")
    assert(new java.io.File(s"$dir/codes").exists())
    assert(!new java.io.File(s"$dir/codes_old").exists())
    assert(!StreamingIndex.compactionDue(spark, dir, maxGens = 8),
      "recovered index still reads as due")
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === preDel,
      "post-policy-recovery search diverged")

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("torn generations are invisible; folded delete waves don't kill re-admitted ids") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx_torn").toString
    val cut = StreamingIndex.buildFrozen(spark, d, dir)
    val newVecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= cut).select(col("vec_id"), col("embedding"))
    StreamingIndex.appendBatch(dir)(newVecs, 0L)
    val pre = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq

    // ---- TORN WAVE (round-15, the r14 advice): a crash mid-write
    // leaves partial part-files and no _SUCCESS. The payload is a
    // duplicate of a served row's codes — exactly what would double ADC
    // sums if a raw read folded it into gen=-1 before the replay
    // (which the append horizon does NOT skip: the torn gen never
    // committed) re-landed the full wave on top.
    val someId = pre.head.getAs[Long]("vec_id")
    val dupRows = spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id") === someId)
      .select(col("vec_id"), col("m"), col("cid"), col("cell"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(dupRows.nonEmpty)
    dupRows.toDF("vec_id", "m", "cid", "cell")
      .write.mode("overwrite").parquet(s"$dir/codes/gen=99")
    assert(new java.io.File(s"$dir/codes/gen=99/_SUCCESS").delete())
    spark.catalog.refreshByPath(s"$dir/codes")
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === pre,
      "a torn generation's partial rows are visible to serving")
    StreamingIndex.compact(spark, dir) // must NOT fold the torn partials
    assert(!new java.io.File(s"$dir/codes/gen=99").exists(),
      "the swap must discard the torn leftover (its wave replays in full)")
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === pre,
      "torn-wave partials folded by compaction")

    // ---- folded DELETE wave replay vs a re-admitted vec_id: tombstones
    // apply as an unordered anti-join, so without the _HORIZON_DELETE
    // guard a post-compaction replay of delete wave 0 would kill the
    // re-admitted vector.
    val victim = pre.filter(_.getAs[Long]("vec_id") >= cut)
      .head.getAs[Long]("vec_id")
    StreamingIndex.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 0L)
    StreamingIndex.compact(spark, dir) // folds the tombstone; _HORIZON_DELETE = 0
    val readmit = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") === victim).select(col("vec_id"), col("embedding"))
    StreamingIndex.appendBatch(dir)(readmit, 1L)
    val back = StreamingIndex.searchTopK(spark, d, dir).collect().toSeq
    assert(back.exists(_.getAs[Long]("vec_id") == victim),
      "re-admitted id not served — the re-admission branch is dormant")
    StreamingIndex.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 0L) // the replay
    assert(!new java.io.File(s"$dir/tombs").exists(),
      "a folded delete wave's replay re-landed past the horizon guard")
    assert(StreamingIndex.searchTopK(spark, d, dir).collect().toSeq === back)
    // a genuinely NEW delete wave (above the horizon) still lands
    StreamingIndex.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 1L)
    assert(!StreamingIndex.searchTopK(spark, d, dir).collect()
        .exists(_.getAs[Long]("vec_id") == victim),
      "the delete-horizon guard over-blocks new delete waves")

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
