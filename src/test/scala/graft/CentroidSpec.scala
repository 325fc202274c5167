package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q128's streaming twin: the per-label centroid moment state
  * (LongVecSum — additive long vector sums) maintained over waves must
  * equal the batch moments over the union after EVERY wave, and the
  * centroid a monitor reconstructs from the state must reproduce the
  * oracled query's own distances bit-for-bit.
  */
class CentroidSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def prepped = Tables.embeddings(spark, d)
    .select(col("vec_id"), col("label"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    .withColumn("vq", transform(col("v"), x => floor(x * lit(1000000.0))))

  test("streaming centroid state equals batch moments after every wave") {
    import spark.implicits._
    val rows = prepped.select(col("vec_id"), col("label"), col("vq"))
      .as[(Long, Int, Seq[Long])].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int, Seq[Long])]
    val q = graft.streaming.StreamingSketch.centroidState(
        source.toDS().toDF("vec_id", "label", "vq"))
      .writeStream.format("memory").queryName("centroid_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(Long, Int, Seq[Long])]
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("centroid_stream")
          .as[(Int, Seq[Long], Long)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        // batch truth: plain Scala accumulation (order-independent longs)
        val batch = seen.groupBy(_._2).view.mapValues { vs =>
          val s = vs.map(_._3).reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
          (s, vs.length.toLong)
        }.toMap
        assert(streamed == batch, s"wave ${seen.length}: centroid state diverges from batch")
      }
    } finally q.stop()
  }

  test("reconstructed centroid reproduces q128's distances bit-for-bit") {
    import spark.implicits._
    // the monitor-side readout: centroid from the (S, n) state, d2 via
    // the same fixed association the query uses
    val state = graft.streaming.StreamingSketch.centroidState(
      prepped.select(col("label"), col("vq")))
    val cent = state.select(col("label"),
      transform(col("S"), q => q.cast("double") / (lit(1000000.0) * col("n"))).as("cv"))
    val rescored = prepped.join(broadcast(cent), Seq("label"))
      .withColumn("d2", graft.functions.DotFold(col("v"), col("v"))
        - lit(2.0) * graft.functions.DotFold(col("v"), col("cv"))
        + graft.functions.DotFold(col("cv"), col("cv")))
      .select(col("vec_id"), col("d2")).as[(Long, Double)].collect().toMap
    val fromQuery = SparkEntry.queries("q128_embedding_outliers")(spark, d)
      .select(col("vec_id"), col("d2")).as[(Long, Double)].collect().toMap
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(rescored.size == fromQuery.size)
    for ((id, dq) <- fromQuery)
      assert(rescored(id) == dq, s"vec $id: monitor d2 ${rescored(id)} != query d2 $dq")
  }
}
