package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** Online ingest dedup (StreamingDedup) ≡ batch q51 on the real corpus:
  * documents arrive across several micro-batches, keyed bucket state
  * accumulates, and the union of emitted pairs (deduped across sharing
  * bands) must equal the batch pipeline's verified pairs exactly.
  */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("streaming ingest dedup emits exactly the batch q51 pair set across micro-batches") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val d = "/root/testdata/sf0.001"
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = StreamingDedup.pairs(source.toDS().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("ingest_dedup")
        .outputMode("append").start()
      try {
        // three waves of arrivals — pairs must span waves via bucket state
        for (chunk <- docs.grouped((docs.length + 2) / 3)) {
          source.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        val streamed = spark.table("ingest_dedup")
          .select(col("da"), col("db"), col("dist"))
          .distinct() // a pair sharing k bands emits k times (documented)
          .as[(Long, Long, Int)].collect().toSet
        val batch = SparkEntry.queries("q51_simhash64")(spark, d)
          .as[(Long, Long, Int)].collect().toSet
        assert(streamed === batch,
          s"streaming pair set diverges from batch q51: " +
            s"only-streaming=${(streamed -- batch).take(5)} only-batch=${(batch -- streamed).take(5)}")
        assert(batch.nonEmpty, "corpus has no near-dup pairs — spec is vacuous")
      } finally q.stop()
      queries.releasePersisted()
      spark.catalog.clearCache()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("rolling label maintenance over the pair stream converges to the batch components") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val d = "/root/testdata/sf0.001"
      val labelDir = java.nio.file.Files.createTempDirectory("graft_slbl").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_slbl_ckpt").toString
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingLabels.start(
        graft.streaming.StreamingDedup.pairs(source.toDS().toDF("doc_id", "text")).toDF(),
        labelDir, ckpt)
      var interim = Map.empty[Long, Long]
      try {
        for ((chunk, i) <- docs.grouped((docs.length + 2) / 3).zipWithIndex) {
          source.addData(chunk.toSeq: _*)
          q.processAllAvailable()
          if (i == 1) // mid-stream snapshot for the monotonicity check
            interim = graft.streaming.StreamingLabels.labels(spark, labelDir)
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
      } finally q.stop()

      // converged rolling labels == from-scratch components of the batch
      // pair graph (streaming pairs ≡ batch pairs per the sibling test)
      val got = graft.streaming.StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchPairs = graft.queries.TextQueries.dupPairs(spark, d)
      val want = graft.ops.Dedup.fromPairs(batchPairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "rolling labels diverge from the batch components")
      assert(got.nonEmpty)
      // labels only ever decrease as waves merge (monotone maintenance)
      assert(interim.nonEmpty && interim.forall { case (id, l) => got(id) <= l })

      // replaying the last generation's merge is a no-op (_SUCCESS skip)
      val lastGen = new java.io.File(labelDir).listFiles()
        .filter(_.getName.startsWith("gen=")).map(_.getName.stripPrefix("gen=").toLong).max
      graft.streaming.StreamingLabels.mergeBatch(labelDir)(
        Seq((0L, 999999L)).toDF("da", "db"), lastGen)
      val replayed = graft.streaming.StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(replayed == got, "replayed batch mutated the label table")

      // a crashed/in-flight write (gen dir without _SUCCESS) must be
      // invisible: readers fall back to the last COMPLETE generation
      val partial = new java.io.File(s"$labelDir/gen=${lastGen + 7}")
      assert(partial.mkdirs())
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(partial.getPath, "part-00000.parquet"), "garbage")
      val fallback = graft.streaming.StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fallback == got, "reader exposed a marker-less partial generation")

      queries.releasePersisted()
      spark.catalog.clearCache()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("partitioned label storage: a wave rewrites only touched buckets; two-step retirement") {
    import spark.implicits._
    import graft.streaming.StreamingLabels
    val dir = java.nio.file.Files.createTempDirectory("graft_plbl").toString
    val P = 8

    // byte-level fingerprint of every data file under the label dir —
    // the untouched-bucket assertion is on CONTENT AND PATH, so a
    // rewrite that reproduced identical bytes under a new gen would
    // still fail (the point is the files are never reopened)
    def fingerprint(): Map[String, Int] = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(f => root.toPath.relativize(f.toPath).toString ->
          java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath)))
        .toMap
    }
    def genParts(g: Long): Set[String] =
      new java.io.File(s"$dir/gen=$g").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("part="))
        .map(_.getName).toSet
    def allLabels(): Map[Long, Long] =
      StreamingLabels.labels(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def want(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      graft.ops.Dedup.fromPairs(pairs.toDF("da", "db"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // wave 1: three disjoint pairs across six buckets
    val w1 = Seq((1L, 2L), (3L, 4L), (5L, 6L))
    StreamingLabels.mergeBatch(dir, P)(w1.toDF("da", "db"), 1L)
    assert(genParts(1L) === Set("part=1", "part=2", "part=3", "part=4", "part=5", "part=6"))
    assert(allLabels() === want(w1))
    val snap1 = fingerprint()

    // wave 2: one fresh id joining an existing component — ONLY its
    // bucket (pmod(17,8)=1) rewrites; every other bucket's files stay
    // byte-identical at their original paths
    val w2 = Seq((17L, 2L))
    StreamingLabels.mergeBatch(dir, P)(w2.toDF("da", "db"), 2L)
    assert(genParts(2L) === Set("part=1"), "wave 2 rewrote untouched buckets")
    assert(allLabels() === want(w1 ++ w2))
    val snap2 = fingerprint()
    assert(snap1.forall { case (p, h) => snap2.get(p).contains(h) },
      "an untouched bucket's file changed or vanished inside the wave")

    // wave 3: fresh pair in buckets 1 and 2 — gen=2 (part=1 only)
    // becomes fully superseded and must be STAMPED, not deleted (the
    // lazy-reader grace window)
    val w3 = Seq((9L, 10L))
    StreamingLabels.mergeBatch(dir, P)(w3.toDF("da", "db"), 3L)
    assert(genParts(3L) === Set("part=1", "part=2"))
    assert(new java.io.File(s"$dir/gen=2/_RETIRED").exists(),
      "superseded generation not stamped")
    assert(new java.io.File(s"$dir/gen=2").exists(),
      "stamping wave deleted the generation it superseded — no grace window")
    assert(allLabels() === want(w1 ++ w2 ++ w3))

    // wave 4: buckets 3,4 — the LATER wave deletes the stamped gen=2;
    // gen=1 still carries the only copy of buckets 5,6 and must stay.
    // Passed with a DIFFERENT parts value: the table's pinned P=8 wins
    // (pmod(11,8)=3 / pmod(12,8)=4 — under P=4 they would land in 3,0)
    val w4 = Seq((11L, 12L))
    StreamingLabels.mergeBatch(dir, 4)(w4.toDF("da", "db"), 4L)
    assert(genParts(4L) === Set("part=3", "part=4"),
      "bucket count not pinned across waves")
    assert(!new java.io.File(s"$dir/gen=2").exists(),
      "stamped generation survived a later wave")
    assert(new java.io.File(s"$dir/gen=1").exists(),
      "a generation still latest-for-some-bucket was deleted")
    assert(allLabels() === want(w1 ++ w2 ++ w3 ++ w4))

    // replay of wave 2 is a no-op on the marker even though its gen dir
    // was retired and deleted — _SUCCESS of gen=2 is gone, so the guard
    // is the merge itself: pairs already inside one component relabel
    // nothing and touch no bucket
    StreamingLabels.mergeBatch(dir, P)(w2.toDF("da", "db"), 5L)
    assert(allLabels() === want(w1 ++ w2 ++ w3 ++ w4),
      "replaying an already-folded wave changed the labels")
    assert(genParts(5L) === Set.empty,
      "an all-internal wave rewrote buckets")

    // ---- delete waves (the q149 operator through the serving loop) ----
    // deleting 2 breaks {1,2,17}: 1 and 17 become pairless and DROP;
    // deleting 5 kills {5,6} outright — buckets 5 and 6 become EMPTY
    // and must mask the older copies with file-less part dirs
    StreamingLabels.deleteBatch(dir, P)(Seq(2L, 5L).toDF("id"), 6L)
    val liveAfter6 = Seq((3L, 4L), (9L, 10L), (11L, 12L))
    assert(allLabels() === want(liveAfter6))
    assert(genParts(6L) === Set("part=1", "part=2", "part=5", "part=6"))
    assert(new java.io.File(s"$dir/gen=6/part=5").listFiles()
      .forall(f => f.getName.startsWith("_") || f.getName.startsWith(".")),
      "an emptied bucket's masking dir holds data files")

    // crash window: tombstones lost after the label gen landed — the
    // replay must recompute identically and restore the tombstones
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/tombs/gen=6"))
    StreamingLabels.deleteBatch(dir, P)(Seq(2L, 5L).toDF("id"), 6L)
    assert(allLabels() === want(liveAfter6), "crash-window delete replay diverged")
    assert(new java.io.File(s"$dir/tombs/gen=6/_SUCCESS").exists())
    // committed replay is a marker no-op
    StreamingLabels.deleteBatch(dir, P)(Seq(2L, 5L).toDF("id"), 6L)
    assert(allLabels() === want(liveAfter6))

    // a merge wave after deletes: 17 (dropped, not deleted) may re-pair;
    // a pair naming tombstoned 2 must NOT resurrect it
    StreamingLabels.mergeBatch(dir, P)(Seq((17L, 3L), (2L, 9L)).toDF("da", "db"), 7L)
    val liveAfter7 = liveAfter6 :+ (17L, 3L)
    assert(allLabels() === want(liveAfter7),
      "post-delete merge diverged (resurrection guard or re-pairing broken)")
    val lp = StreamingLabels.livePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lp === liveAfter7.map { case (a, b) => (a, b) }.toSet,
      "pair log out of sync with the folded waves")

    // ---- pair-log compaction (bounds the tombstone anti-join) ----
    // crash-window first: log renamed aside mid-swap — the next compact
    // must recover it before doing anything else
    assert(new java.io.File(s"$dir/pairlog")
      .renameTo(new java.io.File(s"$dir/pairlog_old")))
    StreamingLabels.compactPairLog(spark, dir)
    assert(new java.io.File(s"$dir/pairlog").exists() &&
      !new java.io.File(s"$dir/pairlog_old").exists())
    assert(!new java.io.File(s"$dir/tombs").exists(),
      "compaction left the tombstone dirs")
    assert(new java.io.File(s"$dir/pairlog/gen=-1/_SUCCESS").exists(),
      "compacted log generation not committed")
    spark.catalog.refreshByPath(s"$dir/pairlog")
    val lpc = StreamingLabels.livePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lpc === lp, "compaction changed the live pair set")
    // the loop continues off the compacted log: delete 4 (bridge of
    // {3,4,17}? no — 4 is a leaf; {3,17} survive via (17,3))
    StreamingLabels.deleteBatch(dir, P)(Seq(4L).toDF("id"), 8L)
    assert(allLabels() === want(Seq((9L, 10L), (11L, 12L), (17L, 3L))),
      "post-compaction delete wave diverged")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("update waves: re-crawl kills old pairs, revives the doc, co-commits at one batchId") {
    import spark.implicits._
    import graft.streaming.StreamingLabels
    val dir = java.nio.file.Files.createTempDirectory("graft_ulbl").toString
    val P = 8
    def allLabels(): Map[Long, Long] =
      StreamingLabels.labels(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def want(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      graft.ops.Dedup.fromPairs(pairs.toDF("da", "db"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def livePairSet(): Set[(Long, Long)] =
      StreamingLabels.livePairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def genParts(g: Long): Set[String] =
      new java.io.File(s"$dir/gen=$g").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("part="))
        .map(_.getName).toSet

    // waves 1-3: the delete-then-stale-arrival preamble — doc 2 leaves,
    // a late pair naming it must stay suppressed
    StreamingLabels.mergeBatch(dir, P)(
      Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 7L)).toDF("da", "db"), 1L)
    StreamingLabels.deleteBatch(dir, P)(Seq(2L).toDF("id"), 2L)
    StreamingLabels.mergeBatch(dir, P)(Seq((2L, 9L)).toDF("da", "db"), 3L)
    assert(allLabels() === want(Seq((3L, 4L), (5L, 6L))),
      "stale arrival resurrected a tombstoned doc")

    // wave 4: doc 2 RE-CRAWLED — new content pairs with 5. The update
    // must admit the new pair while the pre-delete pairs (1,2)/(2,7)
    // and the suppressed stale (2,9) stay dead.
    StreamingLabels.updateBatch(dir, P)(
      Seq(2L).toDF("id"), Seq((2L, 5L)).toDF("da", "db"), 4L)
    assert(allLabels() === want(Seq((3L, 4L), (5L, 6L), (2L, 5L))),
      "update wave did not revive the re-crawled doc with exactly its new pairs")
    assert(livePairSet() === Set((3L, 4L), (5L, 6L), (2L, 5L)),
      "generation-ordered liveness wrong after the update wave")
    // touched buckets only: 2 is fresh, 5 and 6 relabel 5 -> 2
    assert(genParts(4L) === Set("part=2", "part=5", "part=6"),
      "update wave rewrote untouched buckets")

    // wave 5: 2 is alive again — a fresh pair naming it must be ADMITTED
    // (the ingestion filter consults revives, not just tombstones)
    StreamingLabels.mergeBatch(dir, P)(Seq((2L, 11L)).toDF("da", "db"), 5L)
    assert(allLabels() === want(Seq((3L, 4L), (5L, 6L), (2L, 5L), (2L, 11L))),
      "post-revival arrival was wrongly suppressed")

    // time travel: the as-of read reconstructs the post-wave-4 state
    // from the log (generation-ordered liveness replayed at that point)
    def labelsAt(b: Long): Map[Long, Long] =
      StreamingLabels.labelsAt(spark, dir, b)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labelsAt(4L) === want(Seq((3L, 4L), (5L, 6L), (2L, 5L))),
      "labelsAt(4) diverged from the state observed after wave 4")
    assert(labelsAt(2L) === want(Seq((3L, 4L), (5L, 6L))),
      "labelsAt(2) did not replay the delete wave's effect")

    // wave 6: update of a LIVE doc (4): old pair (3,4) dies — 3 drops
    // pairless — and the new content pairs with fresh 13
    StreamingLabels.updateBatch(dir, P)(
      Seq(4L).toDF("id"), Seq((4L, 13L)).toDF("da", "db"), 6L)
    val after6 = Seq((5L, 6L), (2L, 5L), (2L, 11L), (4L, 13L))
    assert(allLabels() === want(after6),
      "in-place update did not retract the old content's pairs")

    // wave 7 deletes 6; wave 8 updates 13 whose only new pair names the
    // DEAD 6 — the third-party guard drops it, and 13's own old pair
    // (4,13) dies with the update: 4 and 13 both drop pairless
    StreamingLabels.deleteBatch(dir, P)(Seq(6L).toDF("id"), 7L)
    assert(allLabels() === want(Seq((2L, 5L), (2L, 11L), (4L, 13L))))
    StreamingLabels.updateBatch(dir, P)(
      Seq(13L).toDF("id"), Seq((13L, 6L)).toDF("da", "db"), 8L)
    val after8 = Seq((2L, 5L), (2L, 11L))
    assert(allLabels() === want(after8),
      "an update resurrected a third party through its new pairs")

    // crash window: revives lost after everything else landed — the
    // replay must recompute identically and restore the marker
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/revives/gen=8"))
    StreamingLabels.updateBatch(dir, P)(
      Seq(13L).toDF("id"), Seq((13L, 6L)).toDF("da", "db"), 8L)
    assert(allLabels() === want(after8), "crash-window update replay diverged")
    assert(new java.io.File(s"$dir/revives/gen=8/_SUCCESS").exists())
    // committed replay is a marker no-op
    StreamingLabels.updateBatch(dir, P)(
      Seq(13L).toDF("id"), Seq((13L, 6L)).toDF("da", "db"), 8L)
    assert(allLabels() === want(after8))

    // compaction materializes the generation-ordered filter and drops
    // BOTH the tombstones and the revives
    val lpBefore = livePairSet()
    StreamingLabels.compactPairLog(spark, dir)
    assert(!new java.io.File(s"$dir/tombs").exists())
    assert(!new java.io.File(s"$dir/revives").exists(),
      "compaction left the revives dirs")
    spark.catalog.refreshByPath(s"$dir/pairlog")
    assert(livePairSet() === lpBefore, "compaction changed the live pair set")
    // the compaction horizon bounds time travel: at-or-above replays,
    // below FAILS LOUDLY (the history is materialized away)
    assert(StreamingLabels.compactionHorizon(spark, dir) === Some(8L))
    assert(labelsAt(8L) === want(after8),
      "labelsAt at the horizon diverged from the pre-compaction state")
    intercept[IllegalArgumentException] { labelsAt(7L) }
    // the loop continues: an update wave off the compacted log
    StreamingLabels.updateBatch(dir, P)(
      Seq(11L).toDF("id"), Seq((11L, 5L)).toDF("da", "db"), 9L)
    assert(allLabels() === want(Seq((2L, 5L), (11L, 5L))),
      "post-compaction update wave diverged")
    // the compacted log's pairs sit at gen=-1: the update's tombstone
    // (gen 9) kills (2,11) there while the wave's own (11,5) survives
    assert(livePairSet() === Set((2L, 5L), (11L, 5L)),
      "generation-ordered liveness wrong against the compacted log")

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
