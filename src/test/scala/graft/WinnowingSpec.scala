package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** String-level behavioral guard for q101 (winnowing fingerprints):
  * the whole pipeline — gram hashing, window selection with rightmost
  * tie-break, occupancy cap, pair rollup — recomputed from raw text in
  * plain Scala (char-folds from first principles, not ShingleHash), so
  * a both-engines-drift failure the oracle can't see surfaces here.
  * Also asserts the winnowing THEOREM on this corpus: every pair of
  * docs sharing a verbatim run of ≥ W+K−1 tokens shares a fingerprint.
  */
class WinnowingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val P2 = 2147483647L
  private val K = TextQueries.WinnowK
  private val W = TextQueries.WinnowW

  private def fold(s: String, m: Long): Long =
    s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 31 + (b & 0xffL)) % m)

  /** doc → (pos → h62) gram hashes and the winnowed fingerprint h62 set. */
  private def model(docs: Seq[(Long, String)])
      : (Map[Long, IndexedSeq[Long]], Map[Long, Set[Long]]) = {
    val grams = docs.map { case (id, t) =>
      val toks = t.split(" ", -1).toIndexedSeq
      val gs =
        if (toks.length < K) IndexedSeq.empty[Long]
        else toks.sliding(K).map(g => {
          val s = g.mkString(" "); fold(s, P) * 2147483648L + fold(s, P2)
        }).toIndexedSeq
      id -> gs
    }.toMap
    val fps = grams.map { case (id, gs) =>
      val ng = gs.length
      val sel = (1 to math.max(1, ng - W + 1)).flatMap { i =>
        val win = (i to math.min(i + W - 1, ng)).map(p => (gs(p - 1) % 2147483648L, -p, p))
        if (win.isEmpty) None else Some(win.min._3)
      }.toSet
      id -> sel.map(p => gs(p - 1))
    }
    (grams, fps.filter(_._2.nonEmpty))
  }

  test("q101 equals the string-level winnowing model, cap and rollup included") {
    val out = SparkEntry.queries("q101_winnowing")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (_, fps) = model(docs)

    val occOk = fps.toSeq.flatMap { case (id, hs) => hs.map(h => (h, id)) }
      .groupBy(_._1).filter(_._2.size <= TextQueries.WinnowCap).keySet
    val ids = fps.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      shared = (fps(a) & fps(b)).count(occOk)
      if shared >= TextQueries.WinnowMinShared
    } yield {
      val (na, nb) = (fps(a).size.toLong, fps(b).size.toLong)
      (a, b, shared.toLong, na, nb, shared.toDouble / math.min(na, nb))
    }).sortBy(p => (p._1, p._2))

    assert(out.toSeq == expect, "q101 diverges from the winnowing model")
    assert(expect.nonEmpty, "no winnowing pairs at spec scale — vacuous")
    assert(expect.exists(_._6 >= 0.9) && expect.exists(_._6 < 0.5),
      "overlap column not discriminative — near-dups and grazes should differ")
  }

  test("winnowing guarantee: a shared >= W+K-1 token run implies a shared fingerprint") {
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val (_, fps) = model(docs)

    // ground truth: doc pairs sharing a verbatim (W+K-1)-token run
    val t = W + K - 1
    val runs = docs.flatMap { case (id, txt) =>
      val toks = txt.split(" ", -1)
      if (toks.length < t) Nil
      else toks.sliding(t).map(r => (r.mkString(" "), id)).toSeq
    }.groupBy(_._1).values.map(_.map(_._2).distinct.sorted).filter(_.length > 1)
    val truthPairs = runs.flatMap(ds =>
      for (i <- ds.indices; j <- i + 1 until ds.length) yield (ds(i), ds(j))).toSet

    assert(truthPairs.nonEmpty, "no shared runs at spec scale — guarantee unexercised")
    val violations = truthPairs.filter { case (a, b) =>
      (fps.getOrElse(a, Set.empty) & fps.getOrElse(b, Set.empty)).isEmpty
    }
    assert(violations.isEmpty,
      s"winnowing guarantee violated for ${violations.take(5)}")
  }
}
