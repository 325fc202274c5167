package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSketch

/** Streaming CMS maintenance ≡ batch: the counter table after each wave
  * of arrivals must equal the batch sketch over every document seen so
  * far — additivity IS the merge, so a plain streaming aggregation in
  * complete mode maintains the exact sketch with no custom state.
  */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("streaming CMS counters equal the batch sketch after every wave") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamingSketch.cmsCounters(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(Long, String)]
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("cms_stream")
          .as[(Int, Long, Long)].collect().toSet
        val batch = StreamingSketch.cmsCounters(
            seen.toDF("doc_id", "text"))
          .as[(Int, Long, Long)].collect().toSet
        assert(streamed == batch,
          s"wave ${seen.length}: streaming counters diverge from batch")
        assert(streamed.nonEmpty)
      }
      // the full-corpus counters also back the q84 sketch exactly
      val full = spark.table("cms_stream").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
      val viaQ84 = SparkEntry.queries("q84_cms_heavy")(spark, d).collect()
      queries.releasePersisted()
      spark.catalog.clearCache()
      // q84's est = min over this gram's counters; spot-check the top row
      val mods = graft.queries.PipelineQueries.CmsMods
      val wdt = graft.queries.PipelineQueries.CmsWidth
      for (r <- viaQ84.take(5)) {
        val g = r.getLong(1)
        val est = mods.zipWithIndex
          .map { case (m, i) => full((i, (g % m) % wdt)) }.min
        assert(est == r.getLong(3),
          s"gram $g: streaming-maintained counters give est $est, q84 says ${r.getLong(3)}")
      }
    } finally q.stop()
  }

  test("streaming Bloom words equal the batch bitset after every wave") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    // the q88 build side: the eval split's documents arriving as a stream
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = StreamingSketch.bloomWords(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(Long, String)]
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("bloom_stream")
          .as[(Long, Long)].collect().toMap
        // duplicate-tolerant streaming build ≡ batch build over
        // DISTINCT keys (OR idempotence — the twin's whole premise)
        val batch = graft.queries.PipelineQueries.bloomWords(
            seen.toDF("doc_id", "text")
              .select(org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.array_distinct(
                  graft.functions.ShingleHash(col("text"),
                    graft.ops.TextOps.P, 3, graft.ops.TextOps.P2))).as("h"))
              .distinct())
          .as[(Long, Long)].collect().toMap
        assert(streamed == batch,
          s"wave ${seen.length}: streaming bitset diverges from batch")
        assert(streamed.nonEmpty)
        // every word stays a 62-bit non-negative payload (the layout
        // both engines can shift without overflow)
        assert(streamed.values.forall(b => b >= 0L && (b >> 62) == 0L))
      }
    } finally q.stop()
  }

  test("streaming priority reservoir equals the batch top-(k+1) after every wave") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = StreamingSketch.prioritySampleState(
        source.toDS().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("prio_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(Long, String, String)]
      val kk = graft.queries.PipelineQueries.PriorityK + 1
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("prio_stream")
          .as[Seq[(Double, Long, Long)]].collect().head
        val batch = graft.queries.PipelineQueries.priorityRows(
            seen.toDF("doc_id", "source", "text"))
          .select(col("priority"), col("doc_id"), col("n_tokens"))
          .as[(Double, Long, Long)].collect()
          .sortBy(t => (-t._1, t._2)).take(kk).toSeq
        assert(streamed == batch,
          s"wave ${seen.length}: streaming reservoir diverges from batch top-$kk")
      }
      // the final reservoir reads out as exactly q89: rows 1..k are the
      // sample, row k+1's priority is tau
      val reservoir = spark.table("prio_stream")
        .as[Seq[(Double, Long, Long)]].collect().head
      val viaQ89 = SparkEntry.queries("q89_priority_sample")(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4)))
      queries.releasePersisted()
      spark.catalog.clearCache()
      assert(reservoir.length == kk)
      for ((rank, docId, priority) <- viaQ89) {
        assert(reservoir(rank - 1)._2 == docId,
          s"rank $rank: reservoir has ${reservoir(rank - 1)._2}, q89 has $docId")
        assert(reservoir(rank - 1)._1 == priority)
      }
    } finally q.stop()
  }

  test("streaming source stats equal the batch recompute after every wave") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"), col("text"), col("n_chars"))
      .as[(String, String, Long)].collect().sortBy(_.hashCode)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, Long)]
    val q = StreamingSketch.sourceStats(source.toDS().toDF("source", "text", "n_chars"))
      .writeStream.format("memory").queryName("stats_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(String, String, Long)]
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("stats_stream")
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
        val batch = seen.groupBy(_._1).map { case (src, xs) =>
          src -> (xs.size.toLong,
            xs.map(_._2.split(" ", -1).length.toLong).sum,
            xs.map(_._3).min, xs.map(_._3).max)
        }
        assert(streamed == batch, s"state diverged after ${seen.size} docs")
      }
    } finally q.stop()
  }

  test("streaming KMV state equals batch q83's sketch after all waves") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"), col("text"))
      .as[(String, String)].collect().sortBy(_.hashCode)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = StreamingSketch.kmvState(source.toDS().toDF("source", "text"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("kmv_stream")
        .as[(String, Seq[Long])].collect().toMap
      // buffers must be sorted, distinct, and capped at k
      val k = graft.queries.PipelineQueries.KmvK
      for ((src, hs) <- streamed) {
        assert(hs == hs.distinct.sorted, s"$src buffer not a sorted set")
        assert(hs.length <= k)
      }
      // the k-th smallest hash agrees with the batch q83 window form
      val batch = SparkEntry.queries("q83_kmv_distinct")(spark, d).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      queries.releasePersisted()
      spark.catalog.clearCache()
      assert(streamed.keySet == batch.keySet)
      for ((src, kth) <- batch if kth != -1L)
        assert(streamed(src)(k - 1) == kth,
          s"$src: streaming KMV k-th ${streamed(src)(k - 1)} != batch $kth")
    } finally q.stop()
  }
}
