package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q106 (integer-exact BM25 retrieval): the full
  * ranking recomputed from raw parquet in plain Scala over gram
  * STRINGS — the plan's dual-residue hash keys never appear, so a hash
  * collision that shifts a score/ranking would surface here while the
  * oracle (which hashes identically) cannot see it (the q96/q105
  * birthday lesson). Same Long arithmetic as both engines: the model
  * IS the scoring spec.
  */
class Bm25Spec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q106 equals the gram-string BM25 model; top-5 cut and ranking bind") {
    val out = SparkEntry.queries("q106_bm25")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // tf over 3-gram strings, duplicates kept (docs under 3 tokens
    // contribute no grams — dropped exactly like the plan's explode)
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val grams = if (toks.length < 3) Seq.empty[String]
                  else toks.sliding(3).map(_.mkString(" ")).toSeq
      id -> grams.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    }.filter(_._2.nonEmpty).toMap
    val corpus = tf.filter(_._1 % 10 != 0)
    val n = corpus.size.toLong
    val dl = corpus.map { case (id, m) => id -> m.values.sum }
    val t = dl.values.sum
    val df = corpus.toSeq.flatMap(_._2.keys).groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }
      .filter(_._2 <= graft.queries.TextQueries.Bm25DfCap)
    val a = (1000000L * t) / n
    val expect = tf.filter(_._1 % 10 == 0).toSeq.flatMap { case (qid, qgrams) =>
      val scored = corpus.toSeq.flatMap { case (cid, cm) =>
        val shared = qgrams.keySet & cm.keySet & df.keySet
        if (shared.isEmpty) None
        else {
          val score = shared.toSeq.map { g =>
            val idfq = (100000L * n) / df(g)
            val tfv = cm(g)
            val wtf = (220000000000L * tfv) /
              (10000000L * tfv + 3000000L + (9000000000000L * dl(cid)) / a)
            idfq * wtf
          }.sum
          Some((cid, score, shared.size.toLong))
        }
      }
      scored.sortBy { case (cid, score, _) => (-score, cid) }
        .take(graft.queries.TextQueries.Bm25TopK).zipWithIndex
        .map { case ((cid, score, ns), i) => (qid, i + 1, cid, score, ns) }
    }.sortBy(r => (r._1, r._2))

    assert(out.toSeq == expect, "q106 diverges from the gram-string BM25 model")
    assert(expect.nonEmpty, "no retrieval results — vacuous")
    // the top-5 cut must bind somewhere (a query with >5 candidates) and
    // scores must genuinely rank (not all ties broken by doc_id)
    assert(expect.groupBy(_._1).exists(_._2.size == 5), "top-5 never binds")
    assert(expect.map(_._4).distinct.size > 5, "scores degenerate")
  }
}
