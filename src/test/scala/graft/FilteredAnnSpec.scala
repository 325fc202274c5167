package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q115 (filtered vector search + recall audit):
  * the EXACT side re-derived from raw vectors in Scala (the filtered
  * brute force is the audit's ground truth — if it drifts the whole
  * audit grades against the wrong answer), plus the binding facts:
  * post-filtering inside probed cells must actually lose recall
  * somewhere (labels are uncorrelated with cells) while catching
  * something everywhere.
  */
class FilteredAnnSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q118 purity accounts for every vector and sits above the chance line") {
    val out = SparkEntry.queries("q118_cell_purity")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getDouble(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.map(_._2).sum == emb.length.toLong, "cells do not partition the corpus")
    val nLabels = emb.map(_._2).distinct.length
    for ((cell, n, _, topN, purity) <- out) {
      assert(topN <= n && purity == topN.toDouble / n, s"cell $cell arithmetic")
    }
    // modest-but-real concentration (measured): mean purity clears the
    // uniform-chance line with margin, and cells genuinely differ
    val meanPurity = out.map(_._5).sum / out.length
    assert(meanPurity > 1.2 / nLabels, f"mean purity $meanPurity%.3f at chance")
    assert(out.map(_._5).distinct.length > 1, "purity constant across cells")
  }

  test("q115 grades against the true filtered brute force; filter effect binds") {
    val out = SparkEntry.queries("q115_filtered_ann")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toIndexedSeq))
    def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = rows.map(r => r._1 -> math.sqrt(dot(r._3, r._3))).toMap
    // n_exact and label must match the Scala filtered brute force
    for ((qid, label, nExact, nHit, recall) <- out) {
      val (_, ql, qv) = rows.find(_._1 == qid).get
      assert(ql == label, s"q$qid label")
      val exact = rows.filter(r => r._1 != qid && r._2 == ql)
        .map(r => (dot(qv, r._3) / (nrm(qid) * nrm(r._1)), r._1))
        .sortBy { case (c, id) => (-c, id) }.take(5)
      assert(nExact == exact.length.toLong, s"q$qid n_exact")
      assert(nHit >= 0 && nHit <= nExact, s"q$qid hit bounds")
      assert(recall == nHit.toDouble / nExact, s"q$qid recall arithmetic")
    }
    assert(out.length == 5)
    assert(out.exists(_._5 < 1.0), "filtered probing never misses — filter effect vacuous")
    assert(out.forall(_._4 > 0), "a query caught nothing — probe degenerate")
  }
}
