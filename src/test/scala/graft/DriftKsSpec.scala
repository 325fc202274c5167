package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q116 (exact two-sample KS drift): the
  * statistic recomputed with the direct ECDF formulation (per-value
  * counting over raw token lengths, no grid/histogram machinery), and
  * the binding facts: sources genuinely differ (spread of ks values,
  * max well above zero).
  */
class DriftKsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q116 equals the direct ECDF model; drift signal binds") {
    val out = SparkEntry.queries("q116_drift_ks")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val n = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    val expect = docs.groupBy(_._1).toSeq.map { case (src, xs) =>
      val ns = xs.length.toLong
      val num = values.map { v =>
        val cs = xs.count(_._2 <= v).toLong
        val cg = docs.count(_._2 <= v).toLong
        math.abs(cs * n - cg * ns)
      }.max
      (src, ns, num, num.toDouble / (n * ns))
    }.sortBy(_._1)

    assert(out.toSeq == expect.toSeq, "q116 diverges from the direct ECDF model")
    assert(out.map(_._4).max > 0.1, "no source drifts — vacuous")
    assert(out.map(_._4).distinct.length > 1, "ks values do not vary")
  }
}
