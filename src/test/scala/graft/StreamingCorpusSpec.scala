package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCorpus

/** Online corpus ingest (StreamingCorpus) vs a sequential greedy model:
  * documents stream in doc_id order across several micro-batches; the
  * distributed admit decision (bucketed witness dedup) must match a
  * plain-Scala scan that applies the same rule one doc at a time, and
  * the written corpus must be exactly the admitted ∩ quality ∩ sample
  * set, lang-partitioned. The restart case kills the query AFTER a
  * batch's parquet is written but BEFORE its checkpoint commits — the
  * exact at-least-once window a blind append duplicates into — and
  * asserts the restarted ingest converges on the same duplicate-free
  * corpus.
  */
class StreamingCorpusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val d = "/root/testdata/sf0.001"

  private def corpus(): Seq[(Long, String, String, String)] =
    OnlineModels.corpus(spark, d)

  private def greedyAdmitted(docs: Seq[(Long, String, String, String)]): Set[Long] =
    OnlineModels.greedyAdmitted(docs)

  private def expectedIds(admitted: Set[Long]): Set[Long] =
    OnlineModels.expectedIds(spark, d, admitted)

  private def withRocks(body: => Unit): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming ingest equals the sequential greedy admit model, gated and partitioned") {
    import spark.implicits._
    withRocks {
      val out = Files.createTempDirectory("ingest_out").toString
      val ckpt = Files.createTempDirectory("ingest_ckpt").toString
      val docs = corpus()
      val modelAdmitted = greedyAdmitted(docs)
      assert(modelAdmitted.size < docs.length, "model admitted everything — dedup vacuous")

      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String)]
      val q = StreamingCorpus.ingest(
        source.toDS().toDF("doc_id", "source", "lang", "text"), out, ckpt)
      try {
        for (chunk <- docs.grouped((docs.length + 2) / 3)) {
          source.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
      } finally q.stop()

      val written = spark.read.parquet(s"$out/corpus")
      val gotIds = written.select(col("doc_id")).as[Long].collect().toSet
      val expected = expectedIds(modelAdmitted)
      assert(gotIds === expected,
        s"only-streamed=${(gotIds -- expected).take(5)} only-model=${(expected -- gotIds).take(5)}")
      assert(written.count() === gotIds.size, "a doc was written more than once")
      assert(written.columns.contains("lang"), "lang partition column lost")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("kill after an uncommitted batch write, restart: no duplicate docs, same corpus") {
    import spark.implicits._
    withRocks {
      val out = Files.createTempDirectory("ingest_out_r").toString
      val ckpt = Files.createTempDirectory("ingest_ckpt_r").toString
      val docs = corpus()
      val waves = docs.grouped((docs.length + 2) / 3).toSeq

      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String)]
      val stream = source.toDS().toDF("doc_id", "source", "lang", "text")

      // phase 1: wave 0 commits; wave 1's batch CRASHES after its files
      // are on disk but before the checkpoint commit (the at-least-once
      // window a blind append would duplicate into on restart)
      @volatile var arm = false
      val q1 = StreamingCorpus.ingest(stream, out, ckpt,
        onBatchCommitted = _ => if (arm) { arm = false; sys.error("injected crash after write") })
      try {
        source.addData(waves(0): _*)
        q1.processAllAvailable()
        arm = true
        source.addData(waves(1): _*)
        intercept[Exception] { q1.processAllAvailable() }
      } finally q1.stop()
      assert(new java.io.File(s"$out/corpus/batch_id=1/_SUCCESS").exists(),
        "test setup: the crashed batch's files never reached disk")

      // phase 2: restart from the checkpoint — batch 1 replays against
      // its already-written directory (skip), then wave 2 streams in
      val q2 = StreamingCorpus.ingest(stream, out, ckpt)
      try {
        q2.processAllAvailable() // replay of the uncommitted batch
        source.addData(waves(2): _*)
        q2.processAllAvailable()
      } finally q2.stop()

      val written = spark.read.parquet(s"$out/corpus")
      val gotIds = written.select(col("doc_id")).as[Long].collect().toSet
      assert(written.count() === gotIds.size,
        "restart duplicated a doc: at-least-once replay leaked into the corpus")
      val expected = expectedIds(greedyAdmitted(docs))
      assert(gotIds === expected,
        s"only-streamed=${(gotIds -- expected).take(5)} only-model=${(expected -- gotIds).take(5)}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("corpus row lifecycle: takedown, re-crawl update, revival, compaction") {
    import spark.implicits._
    withRocks {
      val out = Files.createTempDirectory("life_out").toString
      val ckpt = Files.createTempDirectory("life_ckpt").toString
      val docs = corpus()
      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String)]
      val q = StreamingCorpus.ingest(
        source.toDS().toDF("doc_id", "source", "lang", "text"), out, ckpt)
      try { source.addData(docs: _*); q.processAllAvailable() } finally q.stop()

      def live(): Map[Long, (String, String, String)] =
        StreamingCorpus.liveCorpus(spark, out).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
          .toMap
      // no lifecycle waves: the latest-wins view IS the append-only view
      val base = live()
      val plain = spark.read.parquet(s"$out/corpus")
        .select(col("doc_id"), col("source"), col("lang"), col("text")).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
        .toMap
      assert(base === plain, "liveCorpus diverges from the plain read pre-lifecycle")
      assert(base.size >= 5, "too few admitted docs to drive the lifecycle")

      val ids = base.keySet.toSeq.sorted
      val (updId, delId, revId) = (ids(0), ids(1), ids(2))
      def passesGate(text: String): Boolean =
        Seq(text).toDF("text")
          .filter(graft.queries.PipelineQueries.qualityGate(col("text")))
          .count() == 1
      // the failing text must fail the SHARED gate (pure repetition)
      val badText = Array.fill(24)("zz").mkString(" ")
      assert(!passesGate(badText),
        "chosen takedown text passes the quality gate — branch vacuous")

      // one update wave: updId re-crawls to a passing text (another
      // admitted doc's text — gate-passing by construction; repeating
      // updId's own text would trip the rep2 gate), revId's re-crawl
      // FAILS the gate and must degrade to a takedown
      val goodText = base(ids(3))._3
      assert(passesGate(goodText) && goodText != base(updId)._3)
      StreamingCorpus.updateBatch(out)(Seq(
        (updId, base(updId)._1, base(updId)._2, goodText),
        (revId, base(revId)._1, base(revId)._2, badText)).toDF(
        "doc_id", "source", "lang", "text"), 100L)
      val after100 = live()
      assert(after100(updId)._3 === goodText, "update did not replace the text")
      assert(!after100.contains(revId),
        "a failing-gate re-crawl left the OLD version serving — takedown degradation broken")
      assert(after100.size === base.size - 1)

      // plain takedown
      StreamingCorpus.deleteBatch(out)(Seq(delId).toDF("doc_id"), 101L)
      assert(!live().contains(delId), "tombstoned doc still serving")

      // revival: a LATER update of the taken-down doc wins by gen order
      val revText = base(ids(4))._3
      assert(passesGate(revText) && revText != base(revId)._3)
      StreamingCorpus.updateBatch(out)(Seq(
        (revId, base(revId)._1, base(revId)._2, revText)).toDF(
        "doc_id", "source", "lang", "text"), 102L)
      assert(live()(revId)._3 === revText, "revival did not serve the new version")

      // committed replay is a marker no-op; crash window (tombs lost
      // after the rows landed) replays into an identical wave
      StreamingCorpus.updateBatch(out)(Seq(
        (revId, base(revId)._1, base(revId)._2, revText)).toDF(
        "doc_id", "source", "lang", "text"), 102L)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$out/tombs/gen=102"))
      StreamingCorpus.updateBatch(out)(Seq(
        (revId, base(revId)._1, base(revId)._2, revText)).toDF(
        "doc_id", "source", "lang", "text"), 102L)
      assert(live()(revId)._3 === revText, "crash-window update replay diverged")

      // an update wave whose EVERY row fails the gate is a pure
      // takedown: the batch dir commits file-less (tombstones still
      // count) and readers must skip it rather than fail schemaless
      StreamingCorpus.updateBatch(out)(Seq(
        (updId, base(updId)._1, base(updId)._2, badText)).toDF(
        "doc_id", "source", "lang", "text"), 103L)
      val preCompact = live()
      assert(!preCompact.contains(updId),
        "all-failing update wave left the old version serving")
      assert(preCompact(revId)._3 === revText)

      // time travel before compaction: the as-of views reconstruct each
      // observed state from the versioned batches + gen-ordered tombs
      def liveAt(b: Long): Map[Long, (String, String, String)] =
        StreamingCorpus.liveCorpusAt(spark, out, b).collect()
          .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
          .toMap
      assert(liveAt(100L) === after100, "liveCorpusAt(100) diverged")
      assert(liveAt(99L) === base, "liveCorpusAt(99) did not predate the update wave")

      // digest-certified compaction: one generation left, tombstoned
      // bytes gone from disk, view unchanged
      StreamingCorpus.compactCorpus(spark, out)
      assert(!new java.io.File(s"$out/tombs").exists(), "compaction left tombstones")
      val gens = new java.io.File(s"$out/corpus").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).map(_.getName)
      assert(gens.toSeq === Seq("batch_id=-1"), s"compaction left generations: ${gens.toSeq}")
      spark.catalog.refreshByPath(s"$out/corpus")
      assert(live() === preCompact, "compaction changed the served view")
      val rawIds = spark.read.parquet(s"$out/corpus").select(col("doc_id"))
        .as[Long].collect()
      assert(!rawIds.contains(delId) && rawIds.length === rawIds.distinct.length,
        "tombstoned bytes survived compaction or a doc kept two versions")

      // the horizon bounds time travel: at-or-above replays, below
      // fails loudly (compaction erased the versions)
      assert(StreamingCorpus.compactionHorizon(spark, out) === Some(103L))
      assert(liveAt(103L) === preCompact,
        "liveCorpusAt at the horizon diverged from the pre-compaction view")
      intercept[IllegalArgumentException] { liveAt(102L) }

      // the loop continues off the compacted table (updId already gone
      // via the all-failing update; take down revId now)
      StreamingCorpus.deleteBatch(out)(Seq(revId).toDF("doc_id"), 104L)
      assert(!live().contains(revId), "post-compaction delete wave diverged")
      assert(liveAt(104L) === live(), "liveCorpusAt(now) diverged from the live view")
      assert(liveAt(103L) === preCompact,
        "a post-compaction wave leaked into an older as-of view")

      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }
}
