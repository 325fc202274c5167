package graft

import org.scalatest.funsuite.AnyFunSuite

/** q178 positional phrase search: (1) the full pipeline re-proven
  * against an independent STRING-level Scala model at sf0.001 (both
  * engines in the oracle pair tokenize-and-join; the model scans raw
  * token arrays with a sliding window — the q96/q101 discipline), with
  * the workload's hit, cross-doc, and miss branches asserted live;
  * (2) the corpus-dormant branches — multiple occurrences of one
  * phrase inside one document (max 1 per (query, doc) at every SF,
  * measured round 18) and sub-5-token documents — forced on a
  * synthetic frame through the same factored core.
  */
class PhraseSearchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def model(docs: Map[Long, Array[String]])
      : (Seq[(Long, String)], Set[(Long, Long, Int)]) = {
    val qs = docs.toSeq.sortBy(_._1).flatMap { case (id, ws) =>
      val h = (id * 48271L) % 2147483647L
      if (ws.length >= 5 && h % 20 == 3) {
        val p = 1 + ((h / 20) % (ws.length - 4)).toInt
        val phrase = ws.slice(p - 1, p + 4)
        Seq(id -> phrase, (id + 1000000L) -> phrase.updated(2, "qzx"))
      } else Seq.empty
    }
    val hits = for {
      (qid, ph) <- qs
      (did, ws) <- docs.toSeq
      i <- 1 to ws.length - 4
      if ws.slice(i - 1, i + 4).sameElements(ph)
    } yield (qid, did, i)
    (qs.map { case (q, ph) => (q, ph.mkString(" ")) }, hits.toSet)
  }

  test("q178 ≡ string-level sliding-window model at sf0.001; all branches live") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val (qs, hits) = model(docs)
    val out = SparkEntry.queries("q178_phrase_search")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val expected = qs.flatMap { case (qid, ph) =>
      val m = hits.filter(_._1 == qid)
      if (m.isEmpty) Seq((qid, ph, -1L, -1))
      else m.toSeq.map { case (_, did, p) => (qid, ph, did, p) }
    }.sortBy(t => (t._1, t._3, t._4))
    assert(out.toSeq.sortBy(t => (t._1, t._3, t._4)) == expected)
    // workload liveness: hits, cross-doc hits, misses
    assert(hits.nonEmpty, "no phrase match at sf0.001 — vacuous")
    assert(hits.exists { case (q, did, _) => q != did },
      "no cross-document phrase match at sf0.001 — the join side is vacuous")
    val missQids = qs.collect { case (q, _) if q >= 1000000L => q }
    assert(missQids.nonEmpty && missQids.forall(q => !hits.exists(_._1 == q)),
      "a guaranteed-miss twin matched — 'qzx' entered the vocabulary")
    // every hit query finds its own source occurrence
    assert(qs.collect { case (q, _) if q < 1000000L => q }
      .forall(q => hits.exists { case (qq, did, _) => qq == q && did == q }))
  }

  test("multi-occurrence and sub-5-token docs (corpus-dormant, forced)") {
    import spark.implicits._
    // smallest slice-member doc_id: (id·48271) mod 2³¹−1 ≡ 3 (mod 20)
    val qd = Iterator.from(0).map(_.toLong)
      .find(id => (id * 48271L) % 2147483647L % 20 == 3).get
    val h = (qd * 48271L) % 2147483647L
    val nw = 20
    val p = 1 + ((h / 20) % (nw - 4)).toInt
    val block = Array("pa", "pb", "pc", "pd", "pe")
    // query doc: the seeded phrase block at p and AGAIN at another
    // non-overlapping position; unique fillers elsewhere
    val ws = Array.tabulate(nw)(i => s"f$i")
    block.indices.foreach(i => ws(p - 1 + i) = block(i))
    val p2 = if (p + 10 <= nw - 4) p + 10 else (if (p > 10) p - 10 else p + 5)
    assert(math.abs(p2 - p) >= 5 && p2 >= 1 && p2 + 4 <= nw)
    block.indices.foreach(i => ws(p2 - 1 + i) = block(i))
    // a second doc (NOT in the slice) holding the phrase once, and a
    // 3-token doc (no 5-gram; must not join and must not be a query)
    val other = Iterator.from(0).map(_.toLong)
      .find(id => id != qd && (id * 48271L) % 2147483647L % 20 != 3).get
    val tiny = Iterator.from(other.toInt + 1).map(_.toLong)
      .find(id => id != qd && (id * 48271L) % 2147483647L % 20 != 3).get
    val docs = Seq(
      (qd, ws.mkString(" ")),
      (other, ("g0 " + block.mkString(" ") + " g1 g2").trim),
      (tiny, "t0 t1 t2")).toDF("doc_id", "text")
    val out = queries.MiscQueries.phraseSearchCore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    queries.releasePersisted()
    spark.catalog.clearCache()
    val expect = Set(
      (qd, qd, math.min(p, p2)), (qd, qd, math.max(p, p2)),
      (qd, other, 2),
      (qd + 1000000L, -1L, -1))
    assert(out == expect, s"got $out expected $expect")
  }
}
