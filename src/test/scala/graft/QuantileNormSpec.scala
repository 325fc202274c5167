package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q113 (cross-source quantile normalization):
  * the mapping recomputed from raw parquet with an explicit global
  * sort (the formulation the interval-histogram plan replaces), plus
  * the properties that make it a calibration: per-source order is
  * preserved, the mapped value is a real global value, and the
  * normalization actually changes values on this corpus.
  */
class QuantileNormSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q113 equals the explicit global-sort model; calibration binds and preserves order") {
    val out = SparkEntry.queries("q113_quantile_norm")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    val n = docs.length.toLong
    val globalSorted = docs.map(_._3).sorted
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
      val ns = xs.length.toLong
      xs.sortBy(x => (x._3, x._1)).zipWithIndex.map { case ((id, _, nt), i) =>
        val r = i + 1L
        val grk = (r * n + ns - 1) / ns
        (id, src, nt, r, grk, globalSorted((grk - 1).toInt))
      }
    }.sortBy(_._1)

    assert(out.toSeq == expect, "q113 diverges from the global-sort model")
    assert(expect.count(e => e._6 != e._3) > 0, "normalization never changes a value — vacuous")
    // monotone within source: higher rank → normalized value never decreases
    for ((_, xs) <- expect.groupBy(_._2)) {
      val byRank = xs.sortBy(_._4).map(_._6)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "normalization broke per-source order")
    }
  }
}
