package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q107 (MMR-diversified re-rank): the greedy
  * selection recomputed brute-force from raw parquet in plain Scala
  * (left-to-right double folds matching DotFold's accumulation order,
  * then the same floor(·10⁶) integer objective). Also proves the
  * diversification BINDS — the picked set must differ from the pure
  * cosine top-5 somewhere, else the operator is vacuous on this data.
  */
class MmrSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q107 equals the brute-force greedy MMR model; diversification binds") {
    import graft.queries.TextQueries.{MmrQueries, MmrPool, MmrK}
    val out = SparkEntry.queries("q107_mmr_rerank")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    def cosI(a: Long, b: Long): Long =
      math.floor(dot(vecs(a), vecs(b)) / (nrm(a) * nrm(b)) * 1e6).toLong

    val expect = vecs.keys.filter(_ < MmrQueries).toSeq.sorted.flatMap { q =>
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, dot(vecs(q), vecs(c)) / (nrm(q) * nrm(c))))
        .sortBy { case (c, cos) => (-cos, c) }.take(MmrPool)
        .map { case (c, cos) => (c, math.floor(cos * 1e6).toLong) }
      val rel = pool.toMap
      var sel = List.empty[Long]
      var picks = List.empty[(Long, Int, Long, Long)]
      for (t <- 1 to MmrK) {
        val best = pool.filter(p => !sel.contains(p._1)).map { case (c, r) =>
          val score = if (sel.isEmpty) 7 * r
                      else 7 * r - 3 * sel.map(s2 => cosI(c, s2)).max
          (c, score)
        }.maxBy { case (c, score) => (score, -c) }
        sel ::= best._1
        picks ::= (q, t, best._1, best._2)
      }
      picks.reverse
    }

    assert(out.toSeq == expect, "q107 diverges from the brute-force MMR model")
    val byQ = expect.groupBy(_._1)
    val divergesSomewhere = byQ.exists { case (q, rows) =>
      val pure = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, dot(vecs(q), vecs(c)) / (nrm(q) * nrm(c))))
        .sortBy { case (c, cos) => (-cos, c) }.take(MmrK).map(_._1)
      rows.sortBy(_._2).map(_._3) != pure
    }
    assert(divergesSomewhere, "MMR never diverges from pure top-5 — vacuous")
  }
}
