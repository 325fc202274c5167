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

  private def corpus(): Seq[(Long, String, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[(Long, String, String, String)].collect().sortBy(_._1).toSeq
  }

  /** Sequential greedy admit model (plain Scala, no Spark): first-wins
    * bucketed witness dedup in arrival order — the spec's independent
    * formulation of the AdmitProcessor contract.
    */
  private def greedyAdmitted(docs: Seq[(Long, String, String, String)]): Set[Long] = {
    val mods = graft.queries.TextQueries.SimhashMods
    def sim16(text: String, mod: Long): Long = {
      // per-bit majority vote of token hashes — the SimHash16 contract
      val votes = Array.fill(16)(0)
      for (w <- text.split(" ", -1)) {
        var h = 0L
        for (c <- w) h = (h * 31 + c.toLong) % mod
        for (b <- 0 until 16) votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
      }
      (0 until 16).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val sigs = docs.map(r => r._1 -> mods.map(m => sim16(r._4, m))).toMap
    val buckets = scala.collection.mutable.Map.empty[(Int, Long), scala.collection.mutable.ArrayBuffer[Long]]
    val admitted = scala.collection.mutable.Set.empty[Long]
    for ((id, _, _, _) <- docs) {
      val sig = sigs(id)
      val dup = (0 until 4).exists { b =>
        buckets.getOrElse((b, sig(b)), Nil).exists { other =>
          val o = sigs(other)
          (0 until 4).map(i => java.lang.Long.bitCount(sig(i) ^ o(i))).sum <=
            graft.queries.TextQueries.SimhashMaxDist
        }
      }
      for (b <- 0 until 4) {
        val buf = buckets.getOrElseUpdate((b, sig(b)), scala.collection.mutable.ArrayBuffer.empty)
        if (buf.size < graft.queries.TextQueries.BandOccCap) buf += id
      }
      if (!dup) admitted += id
    }
    admitted.toSet
  }

  /** Greedy-admitted ∩ shared quality gate ∩ stratified sample. */
  private def expectedIds(admitted: Set[Long]): Set[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id").isInCollection(admitted))
      .filter(graft.queries.PipelineQueries.qualityGate(col("text")))
      .filter(graft.queries.TextQueries.sampleHash < graft.queries.TextQueries.sampleRateBp)
      .select(col("doc_id")).as[Long].collect().toSet
  }

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
