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
}
