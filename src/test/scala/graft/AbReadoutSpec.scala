package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q123 (A/B experiment readout): recomputes the
  * arm assignment, exact integer moments, and the z statistic from raw
  * rows in plain Scala and checks every field; also pins the platform
  * sanity properties — both arms populated for every event type with a
  * near-balanced split (a skewed split = broken assignment hash), and
  * the z values varying across types (the statistic is alive, not a
  * constant). The streaming test proves the complete-mode moment state
  * (StreamingSketch.abState) equals the batch moments after every wave.
  */
class AbReadoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  /** ONE independent model of the assignment + quantization (shared by
    * both tests so the guard can't self-drift; independent of the
    * query and oracle, which is what matters).
    */
  private def assign(u: Long, v: Double): (Long, Long) =
    (((u * 1103515245L + 12345L) % 2147483647L) % 2L, math.floor(v * 100).toLong)

  private def rawRows() = Tables.events(spark, d)
    .select(col("event_type"), col("user_id"), col("value"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("q123 equals the integer-moments model; arms balanced; z varies") {
    val out = SparkEntry.queries("q123_ab_readout")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8),
        r.getDouble(9)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val model = rawRows().map { case (t, u, v) =>
      val (arm, vc) = assign(u, v); (t, arm, vc)
    }.groupBy(_._1)

    assert(out.map(_._1).toSeq == model.keys.toSeq.sorted)
    for ((t, na, nb, sa, sb, ma, mb, va, vb, z) <- out) {
      val g = model(t)
      val (a, b) = (g.filter(_._2 == 0L).map(_._3), g.filter(_._2 == 1L).map(_._3))
      assert(na == a.length.toLong && nb == b.length.toLong, s"$t: arm sizes drift")
      assert(sa == a.sum && sb == b.sum, s"$t: arm sums drift")
      def mv(xs: Seq[Long]): (Double, Double) = {
        val n = xs.length.toLong; val s = xs.sum
        val ss = xs.map(x => BigInt(x) * BigInt(x)).sum // decimal-exact, as the query
        val mean = s.toDouble / 100.0 / n
        val vari = (ss.toDouble / n - (s.toDouble / n) * (s.toDouble / n)) * n / (n - 1) / 10000.0
        (mean, vari)
      }
      val ((ema, eva), (emb, evb)) = (mv(a), mv(b))
      assert(math.abs(ma - ema) < 1e-9 && math.abs(mb - emb) < 1e-9, s"$t: means drift")
      assert(math.abs(va - eva) < 1e-6 && math.abs(vb - evb) < 1e-6, s"$t: variances drift")
      val ez = (ema - emb) / math.sqrt(eva / na + evb / nb)
      assert(math.abs(z - ez) < 1e-6, s"$t: z drifts from model")
      // platform sanity: both arms populated, split near-balanced
      assert(na > 0 && nb > 0, s"$t: an arm is empty — assignment broken")
      assert(math.abs(na - nb).toDouble / (na + nb) < 0.25,
        s"$t: split $na/$nb too skewed — assignment hash suspect")
    }
    assert(out.map(_._10).distinct.length > 1, "z constant across types — weakly exercised")
  }

  test("streaming A/B moment state equals the batch moments after every wave") {
    import spark.implicits._
    val rows = rawRows().map { case (t, u, v) =>
      val (arm, vc) = assign(u, v); (t, arm, vc)
    }.sortBy(t => (t._1, t._3))
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
    val q = graft.streaming.StreamingSketch.abState(
        source.toDS().toDF("event_type", "arm", "vc"))
      .writeStream.format("memory").queryName("ab_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(String, Long, Long)]
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("ab_stream").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (r.getLong(2), r.getLong(3), BigInt(r.getDecimal(4).toBigInteger))).toMap
        val batch = seen.groupBy(t => (t._1, t._2)).view.mapValues { vs =>
          (vs.length.toLong, vs.map(_._3).sum,
            vs.map(v => BigInt(v._3) * BigInt(v._3)).sum)
        }.toMap
        assert(streamed == batch, s"wave ${seen.length}: streaming A/B moments diverge from batch")
      }
    } finally q.stop()
  }
}
