package graft

import org.scalatest.funsuite.AnyFunSuite

/** q147's string-level model (the q80/q96 birthday discipline): the
  * query gates span membership on HASHED gram df ≥ 2, so a residual
  * hash collision could silently extend a span. This spec recomputes
  * the entire table from raw token STRINGS — gram df, islands, passage
  * extraction, content grouping, ordering — with no hashes anywhere,
  * and requires exact equality with the registered query's output.
  */
class DupPassagesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private case class P(passage: String, nTokens: Long, nDocs: Long,
      nSpans: Long, docs: String)

  /** The model: pure Scala over the collected corpus. */
  private def model(docs: Seq[(Long, String)], minTokens: Int, topN: Int): Seq[P] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val grams: Seq[(Long, Int, String)] = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.length < 3) Seq.empty
      else (0 to ts.length - 3).map(i => (id, i + 1, ts.slice(i, i + 3).mkString(" ")))
    }
    val df = grams.groupBy(_._3).view.mapValues(_.map(_._1).distinct.size).toMap
    val spans = grams.filter(g => df(g._3) >= 2)
      .groupBy(_._1).toSeq.flatMap { case (id, gs) =>
        // islands over duplicated positions
        val ps = gs.map(_._2).sorted
        val runs = ps.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: tail, p) if p == e + 1 => (s, p) :: tail
          case (acc, p) => (p, p) :: acc
        }
        runs.map { case (s, e) => (id, s, e - s + 1 + 2) } // token length
      }
      .filter(_._3 >= minTokens)
    val px = spans.map { case (id, p0, nt) =>
      (id, toks(id).slice(p0 - 1, p0 - 1 + nt).mkString(" "))
    }
    px.groupBy(_._2).toSeq.map { case (passage, hits) =>
      val perDoc = hits.groupBy(_._1)
      P(passage, passage.split(" ", -1).length.toLong, perDoc.size.toLong,
        hits.size.toLong,
        perDoc.keys.toSeq.sorted.take(5).map(_.toString).mkString(","))
    }
      .filter(_.nDocs >= 2)
      .sortBy(p => (-p.nDocs, -p.nSpans, p.passage))
      .take(topN)
  }

  test("query == hash-free string model on the real corpus") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val want = model(docs, graft.queries.TextQueries.MinPassageTokens,
      graft.queries.TextQueries.TopDupPassages)
    assert(want.nonEmpty, "model found no duplicated passages — vacuous corpus?")
    val got = SparkEntry.queries("q147_dup_passages")(spark, d).collect()
      .map(r => P(r.getAs[String]("passage"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_spans"),
        r.getAs[String]("docs"))).toSeq
    assert(got == want)
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("single-doc spans drop; multi-span passages count every occurrence") {
    import spark.implicits._
    // synthetic: docs 1/2 share a 20-token passage (doc 2 carries it
    // twice); doc 3's 20-token span shares each gram with SOME doc but
    // the assembled passage is unique to doc 3 — its grams ride doc 4's
    // copy of the first half and doc 5's copy of the second half, so
    // every gram has df ≥ 2 while the span itself must NOT be reported
    // as shared (n_docs = 1 → dropped). Proves the n_docs filter and
    // the n_spans multiplicity on a frame where truth is enumerable.
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    // halves OVERLAP on x12..x14 so every 3-gram of the stitched doc
    // exists in doc 4 (starts x1..x12) or doc 5 (starts x12..x22) —
    // one contiguous df≥2 island spanning the whole 24-token doc
    val firstHalf = (1 to 14).map(i => s"x$i").mkString(" ")
    val secondHalf = (12 to 24).map(i => s"x$i").mkString(" ")
    val stitched = (1 to 24).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"aa bb $shared cc"),
      (2L, s"$shared dd ee ff $shared"),
      (3L, stitched),
      (4L, s"pp qq $firstHalf"),
      (5L, s"$secondHalf rr ss"))
    val want = model(docs, 20, 50)
    assert(want.map(_.passage) == Seq(shared), "synthetic truth mis-built")
    assert(want.head.nDocs == 2L && want.head.nSpans == 3L &&
      want.head.docs == "1,2")
    // run the same frame through the model-vs-query harness? The query
    // reads parquet tables; here the MODEL is the subject — the real-
    // corpus test above pins query == model, this pins model == truth.
    assert(model(docs, 25, 50).isEmpty, "min-token cut dormant")
  }
}
