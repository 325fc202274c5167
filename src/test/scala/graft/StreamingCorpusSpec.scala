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
}
