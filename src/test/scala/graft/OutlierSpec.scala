package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guards for the event-statistics operators: q110
  * (Tukey-fence outliers — fences and the flagged set recomputed
  * brute-force in Scala, both-ways binding) and q117 (burstiness —
  * exact moment sums recomputed from sorted gaps, B straddling zero).
  */
class OutlierSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q117 equals the sorted-gaps moment model; B straddles zero") {
    val out = SparkEntry.queries("q117_burstiness")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), expr("ts_us div 1000000").as("ts_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).toSeq
      .filter(_._2.length >= 2) // single-event users have no gaps — the query drops them
      .map { case (u, xs) =>
        val ts = xs.sortBy(e => (e._3, e._2)).map(_._3)
        val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
        val n = gaps.length.toLong
        val s1 = gaps.sum
        val s2 = gaps.map(g => g * g).sum
        val mu = s1.toDouble / n
        val sigma = math.sqrt((n * s2 - s1 * s1).toDouble) / n
        val b = if (sigma + mu > 0.0) (sigma - mu) / (sigma + mu) else -1.0
        (u, n, s1, s2, mu, sigma, b)
      }.sortBy(_._1)

    assert(out.toSeq == expect.toSeq, "q117 diverges from the moment model")
    assert(out.exists(_._7 > 0) && out.exists(_._7 < 0),
      "burstiness never straddles zero — weakly exercised")
  }

  test("q110 equals the sorted-rank Scala model; flags bind both ways") {
    val out = SparkEntry.queries("q110_outliers")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = ev.groupBy(_._2).toSeq.flatMap { case (t, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._1))
      val n = sorted.length.toLong
      val q1 = sorted(((n + 3) / 4 - 1).toInt)._3
      val q3 = sorted(((3 * n + 3) / 4 - 1).toInt)._3
      val f = 3 * (q3 - q1) / 2
      val (lo, hi) = (q1 - f, q3 + f)
      xs.filter(e => e._3 < lo || e._3 > hi)
        .map(e => (t, e._1, e._3, lo, hi))
    }.sortBy(r => (r._1, r._2))

    assert(out.toSeq == expect, "q110 diverges from the sorted-rank model")
    assert(expect.nonEmpty, "no outliers at sf0.001 — vacuous")
    val flaggedPerType = expect.groupBy(_._1).view.mapValues(_.size).toMap
    val totalPerType = ev.groupBy(_._2).view.mapValues(_.size).toMap
    for ((t, tot) <- totalPerType)
      assert(flaggedPerType.getOrElse(t, 0) < tot, s"$t flags everything")
  }
}
