package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Aggregators.{HdrBins, HdrHist}
import graft.queries.PipelineQueries

/** Guards for q119's HDR quantile sketch beyond the DuckDB oracle:
  * (1) the error-bound GUARANTEE — every reported quantile is a lower
  * bound of the exact rank value within relative error 1/(2·HdrSub) —
  * checked against exact sorted ranks on the real table; (2) the
  * aggregator's merge law on arbitrary splits (the sketch of the union
  * = merged sketches of the parts, any grouping); (3) the Scala bin
  * math ≡ the SQL bin expression bit-for-bit across the value range,
  * so the aggregator/streaming path can never drift from the oracled
  * plan; (4) the streaming twin stays wave-equal to batch
  * (complete-mode MemoryStream, the q83/q84 discipline).
  */
class QuantileSketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"
  private val Sub = PipelineQueries.HdrSub

  test("q119 quantile bounds sandwich the exact rank values within 1/(2 sub)") {
    val full = SparkEntry.queries("q119_hdr_quantile")(spark, d).collect()
    val out = full.map(r => (r.getString(0), r.getLong(1),
      r.getLong(3), r.getLong(5), r.getLong(7)))
    // the reported [lo, hi) bracket IS the error contract: hi is the
    // next bin's lower bound, so hi − lo ≤ lo/Sub for every quantile
    for (r <- full; (loIx, hiIx) <- Seq((3, 4), (5, 6), (7, 8))) {
      val (lo, hi) = (r.getLong(loIx), r.getLong(hiIx))
      assert(hi > lo, s"${r.getString(0)}: bracket [$lo, $hi) is empty")
      assert(hi - lo <= lo / Sub + 1,
        s"${r.getString(0)}: bracket [$lo, $hi) wider than the 1/$Sub contract")
    }
    queries.releasePersisted()
    spark.catalog.clearCache()

    val rows = Tables.orders(spark, d)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val relErr = 1.0 / (2 * Sub)
    for ((grp, n, p50, p90, p99) <- out; (p, got) <- Seq((50, p50), (90, p90), (99, p99))) {
      val vs = byGrp(grp)
      assert(n == vs.length.toLong)
      val exact = vs(((vs.length.toLong * p + 99) / 100).toInt - 1)
      assert(got <= exact, s"$grp p$p: reported $got is not a lower bound of exact $exact")
      assert(exact - got <= 2 * relErr * exact,
        s"$grp p$p: bound $got misses exact $exact beyond the sketch guarantee")
    }
    assert(out.map(_._3).distinct.length > 1, "p50 identical across all groups — weakly exercised")
  }

  test("HdrHist merge law: any split of the stream merges to the full sketch") {
    val agg = HdrHist(Sub)
    val values = (1L to 4000L).map(i => (i * 1103515245L + 12345L) % 2147483647L + 1)
    val whole = values.foldLeft(agg.zero)(agg.reduce)
    for (parts <- Seq(2, 3, 7)) {
      val partials = values.grouped((values.length + parts - 1) / parts)
        .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      assert(merged == whole, s"$parts-way merge diverges from the one-pass sketch")
      // merge order must not matter
      val reversed = partials.reverse.foldLeft(agg.zero)(agg.merge)
      assert(reversed == whole, s"$parts-way reversed merge diverges")
    }
    assert(whole.size > 30, "sketch too coarse on the test stream — weakly exercised")
  }

  test("Scala bin math equals the SQL bin expression across the value range") {
    import spark.implicits._
    // boundary-heavy probe: powers of two, +/-1 neighbors, and an LCG
    // fill — capped at 2^58: the (v-lo)*sub product bounds the sketch
    // domain at v < 2^59 (documented in HdrBins; cents values sit ~40
    // bits below it)
    val probes = ((0 to 58).flatMap(b => Seq((1L << b) - 1, 1L << b, (1L << b) + 1)) ++
      (1L to 1000L).map(i => (i * 6364136223846793005L + 1442695040888963407L).abs % 1000000000L + 1))
      .filter(_ >= 1).distinct
    val viaSql = probes.toDF("vc")
      .withColumn("bl", length(bin(col("vc"))))
      .withColumn("lo", expr("shiftleft(CAST(1 AS BIGINT), bl - 1)"))
      .withColumn("bin", col("bl").cast("long") * Sub + expr(s"((vc - lo) * $Sub) DIV lo"))
      .select(col("vc"), col("bin")).as[(Long, Long)].collect().toMap
    for (v <- probes) {
      assert(viaSql(v) == HdrBins.binOf(v, Sub).toLong,
        s"bin math drift at v=$v: SQL ${viaSql(v)} vs Scala ${HdrBins.binOf(v, Sub)}")
      val lo = HdrBins.binLo(HdrBins.binOf(v, Sub), Sub)
      assert(lo <= v, s"binLo($v) = $lo is not a lower bound")
      assert(v - lo <= v / Sub, s"binLo($v) = $lo violates the sub-bucket width bound")
    }
  }

  test("streaming HDR state equals the batch sketch after every wave; read-out matches q119's math") {
    import spark.implicits._
    val rows = Tables.orders(spark, d)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100).cast("long").as("vc"))
      .as[(String, Long)].collect().sortBy(r => (r._1, r._2))
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingSketch.hdrState(source.toDS().toDF("grp", "vc"))
      .writeStream.format("memory").queryName("hdr_stream")
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[(String, Long)]
      for (chunk <- rows.grouped((rows.length + 2) / 3)) {
        source.addData(chunk.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ chunk
        val streamed = spark.table("hdr_stream")
          .as[(String, Seq[(Int, Long)])].collect().toMap
        val agg = HdrHist(Sub)
        val batch = seen.groupBy(_._1).view
          .mapValues(vs => agg.finish(vs.map(_._2).foldLeft(agg.zero)(agg.reduce))).toMap
        assert(streamed == batch, s"wave ${seen.length}: streaming sketch diverges from batch")
      }
      // final state reads out the same quantile bounds q119 reports
      val finalState = spark.table("hdr_stream")
        .as[(String, Seq[(Int, Long)])].collect().toMap
      val viaQ119 = SparkEntry.queries("q119_hdr_quantile")(spark, d)
        .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(5), r.getLong(7))).toMap
      queries.releasePersisted()
      spark.catalog.clearCache()
      for ((grp, (p50, p90, p99)) <- viaQ119) {
        val bins = finalState(grp)
        assert(HdrBins.quantileLo(bins, 50, Sub) == p50, s"$grp p50 read-out drifts from q119")
        assert(HdrBins.quantileLo(bins, 90, Sub) == p90, s"$grp p90 read-out drifts from q119")
        assert(HdrBins.quantileLo(bins, 99, Sub) == p99, s"$grp p99 read-out drifts from q119")
      }
    } finally q.stop()
  }
}
