package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent-model checks for the round-4 trainer/packer queries:
  * q67's distributed BPE (symbol-wrapped `replace` merges) must equal a
  * plain-Scala BPE trainer that merges token vectors left-to-right —
  * proving the string-encoding trick implements the real merge rule —
  * and q64's windowed packing must equal a sequential per-source
  * offset scan. The DuckDB oracle already cross-checks both; these
  * specs check them against a THIRD, non-SQL formulation.
  */
class BpeAndPackSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] = {
    import spark.implicits._
    val r = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    graft.queries.releasePersisted()
    r
  }

  /** Reference BPE: token-vector merges, greedy left-to-right
    * non-overlapping, argmax by (weight desc, pair asc).
    */
  private def bpeModel(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab = words.toSeq.sortBy(_._1)
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val weights = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        weights((syms(i), syms(i + 1))) = weights.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((a, b), wt) = weights.toSeq
        .minBy { case ((pa, pb), w) => (-w, pa, pb) }
      out += ((r, a, b, a + b, wt))
      vocab = vocab.map { case (syms, c) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { nb += a + b; i += 2 }
          else { nb += syms(i); i += 1 }
        }
        (nb.result(), c)
      }
    }
    out.result()
  }

  test("q67 BPE merges equal the token-vector reference trainer") {
    import spark.implicits._
    val words = docs().iterator
      .flatMap(_._3.split(" ", -1))
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    val expected = bpeModel(words, graft.queries.PipelineQueries.BpeRounds)
    val got = SparkEntry.queries("q67_bpe_train")(spark, d)
      .as[(Int, String, String, String, Long)].collect().toSeq
    graft.queries.releasePersisted()
    assert(got == expected)
    // and each merge's weight must be strictly positive and non-increasing
    // only when pairs coexist — at minimum, positive
    assert(got.forall(_._5 > 0))
  }

  test("q64 packing equals a sequential per-source offset scan") {
    import spark.implicits._
    val L = graft.queries.PipelineQueries.SeqLen
    // (source, seq_id) -> (n_docs, n_straddle, n_tokens)
    val model = scala.collection.mutable.Map.empty[(String, Long), (Long, Long, Long)]
    for ((_, grp) <- docs().groupBy(_._2)) {
      var off = 0L
      for ((_, src, text) <- grp.sortBy(_._1)) {
        val n = text.split(" ", -1).length.toLong
        val (start, end) = (off, off + n)
        for (sq <- start / L to (end - 1) / L) {
          val tok = math.min(end, (sq + 1) * L) - math.max(start, sq * L)
          val straddle = if (start < sq * L) 1L else 0L
          val prev = model.getOrElse((src, sq), (0L, 0L, 0L))
          model((src, sq)) = (prev._1 + 1, prev._2 + straddle, prev._3 + tok)
        }
        off = end
      }
    }
    val got = SparkEntry.queries("q64_seq_pack")(spark, d)
      .select(col("source"), col("seq_id"), col("n_docs"), col("n_straddle"), col("n_tokens"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.queries.releasePersisted()
    assert(got.nonEmpty)
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap == model.toMap)
    // every non-final sequence of a source is exactly full
    val lastPerSource = got.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
    assert(got.filter(r => r._2 != lastPerSource(r._1)).forall(_._5 == L))
  }

  test("q67 BPE stops cleanly when the vocabulary runs out of adjacent pairs") {
    import spark.implicits._
    // "ab a b": round 1 merges (a,b); afterwards every word is a single
    // symbol, so rounds 2..BpeRounds find no pair — the trainer must
    // return the 1 merge learned, not throw on an empty argmax
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_degen").toString
    Seq((1L, "s0", "ab a b"), (2L, "s0", "b a ab"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q67_bpe_train")(spark, tmp)
      .as[(Int, String, String, String, Long)].collect().toSeq
    graft.queries.releasePersisted()
    assert(got == Seq((1, "a", "b", "ab", 2L)))
    // fully degenerate: all words single-char → zero merges, zero rows
    Seq((1L, "s0", "a b c"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val none = SparkEntry.queries("q67_bpe_train")(spark, tmp).collect()
    graft.queries.releasePersisted()
    assert(none.isEmpty)
  }

  test("q68 encoding is bounded by words below and characters above") {
    import spark.implicits._
    val got = SparkEntry.queries("q68_bpe_encode")(spark, d)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    graft.queries.releasePersisted()
    assert(got.size == docs().size)
    // every word is >= 1 BPE symbol and every symbol covers >= 1 char,
    // so n_words <= n_bpe <= total word characters < n_chars (spaces)
    assert(got.forall { case (_, nChars, nWords, nBpe, cpt, fert) =>
      nWords <= nBpe && nBpe < nChars &&
        cpt == nChars.toDouble / nBpe.toDouble &&
        fert == nBpe.toDouble / nWords.toDouble && fert >= 1.0
    })
  }

  test("q65 bigram-LM scores are probabilities and per-doc counts line up") {
    import spark.implicits._
    val nTok = docs().map(r => r._1 -> r._3.split(" ", -1).length.toLong).toMap
    val got = SparkEntry.queries("q65_bigram_lm")(spark, d)
      .as[(Long, Long, Double, Double)].collect().toSeq
    graft.queries.releasePersisted()
    assert(got.map(_._1).toSet == nTok.keySet)
    // mean_p is floor-quantized to 1e-8 (invariant 2), so it can sit up
    // to 1e-8 BELOW the exact mean — and below min_p when a doc has a
    // single bigram
    assert(got.forall { case (id, nb, mean, mn) =>
      nb == nTok(id) - 1 && mn > 0.0 && mn <= mean + 1e-8 && mean <= 1.0
    })
  }

  test("q66 overlap matrix is a full upper triangle with sane Jaccard bounds") {
    import spark.implicits._
    val got = SparkEntry.queries("q66_source_overlap")(spark, d)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    graft.queries.releasePersisted()
    val sources = docs().map(_._2).distinct.size
    assert(got.size <= sources.toLong * (sources - 1) / 2)
    assert(got.forall { case (a, b, na, nb, nc, j) =>
      a < b && nc >= 1 && nc <= math.min(na, nb) &&
        j > 0.0 && j <= 1.0 &&
        math.abs(j - nc.toDouble / (na + nb - nc).toDouble) == 0.0
    })
  }

  test("q162 refresh audit: pair drift binds at sf0.001; weight drift binds everywhere") {
    // measured expectations per SF (round-13): the frozen-4/5 and
    // full-corpus merge tables differ in PAIRS at sf0.001 (rounds 2–3
    // swap) and agree at sf0.01 — but the WEIGHTS drift every round at
    // every SF (the corpus grew), so the audit is non-vacuous even
    // where the pair flag reads zero
    for ((dir, wantChanged) <- Seq("/root/testdata/sf0.001" -> true,
        "/root/testdata/sf0.01" -> false)) {
      val rows = SparkEntry.queries("q162_bpe_refresh")(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getString(4), r.getString(5), r.getLong(6), r.getInt(7)))
      graft.queries.releasePersisted()
      assert(rows.nonEmpty && rows.map(_._1).toSeq == (1 to rows.length),
        "audit rounds not contiguous")
      assert(rows.forall { case (_, oa, ob, _, na, nb, _, f) =>
        (f == 1) == (oa != na || ob != nb) }, "pair_changed flag inconsistent")
      assert(rows.exists(_._8 == 1) == wantChanged,
        s"pair drift expectation violated at $dir")
      assert(rows.exists(r => r._4 != r._7),
        s"weights identical at $dir — the refresh audit is vacuous there")
    }
  }
}
