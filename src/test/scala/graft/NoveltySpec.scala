package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q120 (first-occurrence gram novelty): both the
  * query and its oracle work on gram HASHES, so this model recomputes
  * novelty from the gram STRINGS themselves — a dual-residue collision
  * that slipped past both engines identically would surface here (the
  * q96 birthday lesson: string-level models catch what hash-level
  * gates can't). Also pins the non-vacuity that justified wiring:
  * novelty must bind at 0, at 1, and strictly between, and the
  * per-source cumulative curve must be monotone with cum_novel ≤
  * cum_grams.
  */
class NoveltySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q120 equals the gram-string model; novelty binds at 0, 1, and between") {
    val out = SparkEntry.queries("q120_gram_novelty")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.map { case (id, src, t) =>
      val toks = t.split(" ", -1)
      (id, src, if (toks.length < 3) Set.empty[String]
                else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._3.nonEmpty)
    val firstDoc = grams.flatMap { case (id, _, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val perDoc = grams.map { case (id, src, gs) =>
      (id, src, gs.size.toLong, gs.count(g => firstDoc(g) == id).toLong)
    }
    val bySrc = perDoc.groupBy(_._2)
    val expect = perDoc.sortBy(_._1).map { case (id, src, n, nov) =>
      val prior = bySrc(src).filter(_._1 <= id)
      (id, src, n, nov, nov.toDouble / n, prior.map(_._4).sum, prior.map(_._3).sum)
    }
    assert(out.toSeq == expect.toSeq, "q120 diverges from the gram-string model")

    // non-vacuity, re-measured at spec scale
    assert(out.exists(_._5 == 1.0), "no all-novel doc — first-arrival branch unexercised")
    assert(out.exists(_._5 == 0.0), "no zero-novelty doc — pure re-crawl branch unexercised")
    assert(out.exists(r => r._5 > 0.0 && r._5 < 1.0), "no partial novelty — weakly exercised")
    // cumulative curve: monotone, novel ≤ grams, and ends at the source totals
    for ((src, rows) <- out.groupBy(_._2)) {
      val ordered = rows.sortBy(_._1)
      assert(ordered.forall(r => r._6 <= r._7), s"$src: cum_novel exceeds cum_grams")
      val (cn, cg) = (ordered.map(_._4).sum, ordered.map(_._3).sum)
      assert(ordered.last._6 == cn && ordered.last._7 == cg,
        s"$src: cumulative tail disagrees with the per-doc sums")
    }
  }

  test("streaming first-seen-wave state equals the batch prefix after every wave") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingSketch.gramFirstSeen(
        source.toDS().toDF("batch_id", "text"))
      .writeStream.format("memory").queryName("novelty_stream")
      .outputMode("complete").start()
    try {
      var wave = 0L
      var seen = Seq.empty[(Long, String)]
      for (chunk <- docs.grouped((docs.length + 2) / 3)) {
        wave += 1
        val tagged = chunk.map { case (_, t) => (wave, t) }
        source.addData(tagged.toSeq: _*)
        q.processAllAvailable()
        seen = seen ++ tagged
        val streamed = spark.table("novelty_stream")
          .as[(Long, Long)].collect().toMap
        val batch = graft.streaming.StreamingSketch.gramFirstSeen(
            seen.toDF("batch_id", "text"))
          .as[(Long, Long)].collect().toMap
        assert(streamed == batch, s"wave $wave: streaming first-seen state diverges from batch")
        // novelty curve read-out: on THIS corpus every wave introduces
        // new grams (a zero would be the alarm the operator exists to
        // raise, not a test error — hence the message), and wave 1
        // claims the most (first-arrival dominance)
        val perWave = streamed.values.groupBy(identity).view.mapValues(_.size).toMap
        assert((1L to wave).forall(w => perWave.getOrElse(w, 0) > 0),
          s"wave $wave: a completed wave added zero new grams — corpus changed, re-measure")
        if (wave > 1) assert(perWave(1L) >= perWave.getOrElse(wave, 0),
          "later wave claims more first-seen grams than wave 1 — unexpected for a replayed corpus")
      }
    } finally q.stop()
  }
}
