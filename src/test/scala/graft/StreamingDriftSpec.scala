package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q116's streaming twin: the per-(source, length) histogram state
  * maintained over waves must feed the SAME ksFromHist readout as the
  * batch query — per wave against a batch recompute over the union,
  * and at the end bit-for-bit against the oracled q116 rows.
  */
class StreamingDriftSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("streaming length histogram feeds the identical KS readout after every wave") {
    import spark.implicits._
    val rows = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val q = graft.streaming.StreamingSketch.lengthHist(
        source.toDS().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("drift_hist")
      .outputMode("complete").start()
    try {
      // the memory-sink view exposes one fixed attribute set, so the
      // readout's self-joins would see conflicting references — rebase
      // the state into a fresh local frame per wave (tiny by design)
      def state() = spark.table("drift_hist")
        .as[(String, Long, Long)].collect().toSeq.toDF("source", "v", "c")
      var seen = Seq.empty[(Long, String, String)]
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val fromState = graft.queries.PipelineQueries.ksFromHist(state())
          .collect().map(_.toSeq).toSeq
        val batch = graft.queries.PipelineQueries.ksFromHist(
            graft.queries.PipelineQueries.lengthHist(
              seen.toDF("doc_id", "source", "text")))
          .collect().map(_.toSeq).toSeq
        graft.queries.releasePersisted()
        assert(fromState == batch,
          s"wave ${seen.length}: streaming KS readout diverges from batch")
      }
      // the final state reproduces the oracled query exactly
      val fromState = graft.queries.PipelineQueries.ksFromHist(state())
        .collect().map(_.toSeq).toSeq
      val viaQuery = SparkEntry.queries("q116_drift_ks")(spark, d)
        .collect().map(_.toSeq).toSeq
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
      assert(fromState == viaQuery, "final streaming state diverges from q116")
    } finally q.stop()
  }
}
