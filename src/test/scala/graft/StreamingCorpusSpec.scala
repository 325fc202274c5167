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
  * set, lang-partitioned.
  */
class StreamingCorpusSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("streaming ingest equals the sequential greedy admit model, gated and partitioned") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val d = "/root/testdata/sf0.001"
      val out = Files.createTempDirectory("ingest_out").toString
      val ckpt = Files.createTempDirectory("ingest_ckpt").toString
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
        .as[(Long, String, String, String)].collect().sortBy(_._1)

      // ---- sequential greedy model (plain Scala, no Spark) ----
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
      val modelAdmitted = scala.collection.mutable.Set.empty[Long]
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
        if (!dup) modelAdmitted += id
      }
      assert(modelAdmitted.size < docs.length, "model admitted everything — dedup vacuous")

      // ---- the stream, three waves ----
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
      // expected: greedy-admitted ∩ quality gate ∩ stratified sample
      val expected = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id").isInCollection(modelAdmitted))
        .filter(graft.ops.TextOps.qualityScore(col("text"))
          >= graft.queries.PipelineQueries.QualityThreshold)
        .filter(graft.queries.TextQueries.sampleHash < graft.queries.TextQueries.sampleRateBp)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(gotIds === expected,
        s"only-streamed=${(gotIds -- expected).take(5)} only-model=${(expected -- gotIds).take(5)}")
      assert(written.count() === gotIds.size, "a doc was written more than once")
      assert(written.columns.contains("lang"), "lang partition column lost")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
