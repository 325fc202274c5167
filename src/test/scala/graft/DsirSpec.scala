package graft

import org.scalatest.funsuite.AnyFunSuite

/** q158 (DSIR-style importance selection) against a from-scratch Scala
  * model over raw text: hashed-bigram dims, add-B integer surprisal
  * under the target and source LMs, the milli-bit ratio score, and the
  * exact top-⌊pool/10⌋ selection with (score desc, doc_id) tie-break —
  * recomputed with plain Scala collections, no DataFrames. Also pins
  * the two claims the oracle cannot see: the threshold TIE-BREAK
  * genuinely fires at the oracle SF (more docs share the cut value than
  * seats remain), and the selection is target-LIKE (mean share of a
  * selected doc's dims seen in the target exceeds the pool mean — the
  * DSIR promise, measured 0.89 vs 0.81 before wiring).
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val P = graft.ops.TextOps.P
  private val B = graft.queries.PipelineQueries.DsirDims

  private def dims(text: String): Seq[Long] = {
    val t = text.split(" ", -1)
    (0 until math.max(t.length - 1, 0)).map { i =>
      val g = t(i) + " " + t(i + 1)
      var a = 0L
      for (c <- g) a = (a * 31 + c.toLong) % P
      a % B
    }
  }

  private def bitlen(v: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(v)

  test("q158 == Scala model; tie-break binds at sf0.01; selection is target-like") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      val tgtSrc = graft.queries.PipelineQueries.DsirTargetSrc
      val tgtDims = docs.filter(_._2 == tgtSrc).flatMap(x => dims(x._3))
      val ct = tgtDims.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val nt = tgtDims.length.toLong
      val pool = docs.filter(x => x._2 != tgtSrc && dims(x._3).nonEmpty)
      val poolDims = pool.flatMap(x => dims(x._3))
      val cs = poolDims.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val ns = poolDims.length.toLong
      val scored = pool.map { case (id, src, text) =>
        val ds = dims(text)
        val sb = ds.map(dm => bitlen((ns + B) / (cs(dm) + 1))).sum
        val tb = ds.map(dm => bitlen((nt + B) / (ct.getOrElse(dm, 0L) + 1))).sum
        val md = (1000L * (sb - tb)) / ds.length
        (id, src, ds.length.toLong, sb, tb, md)
      }.sortBy(_._1)
      val k = (scored.length / 10).toLong
      val selIds = scored.sortBy(x => (-x._6, x._1)).take(k.toInt).map(_._1).toSet

      val got = SparkEntry.queries("q158_dsir_select")(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getInt(6)))
      val want = scored.map(x =>
        (x._1, x._2, x._3, x._4, x._5, x._6, if (selIds(x._1)) 1 else 0))
      assert(got.toSeq === want.toSeq, s"q158 diverged from the Scala model at $d")

      // tie-break binds at the oracle SF: docs AT the cut value exceed
      // the seats left after the strictly-better docs take theirs
      if (d.endsWith("sf0.01")) {
        val mstar = scored.filter(x => selIds(x._1)).map(_._6).min
        val ties = scored.count(_._6 == mstar)
        val seats = k - scored.count(_._6 > mstar)
        assert(ties > seats && seats >= 1,
          s"tie-break vacuous: $ties docs at the cut for $seats seats")
      }

      // the DSIR promise: selected docs' dims are seen in the target
      // more often than the pool average
      val tgtSet = ct.keySet
      def cover(text: String): Double = {
        val ds = dims(text); ds.count(tgtSet).toDouble / ds.length
      }
      val covAll = pool.map(x => cover(x._3))
      val covSel = pool.filter(x => selIds(x._1)).map(x => cover(x._3))
      assert(covSel.sum / covSel.length > covAll.sum / covAll.length + 0.02,
        "selection not target-like — the ratio signal is vacuous on this corpus")
    }
    queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("q163: folded counts under the re-crawl wave == from-scratch model; flips fire") {
    // the model knows NO maintenance: it recomputes the whole q158
    // selection over the UPDATED corpus with plain Scala collections,
    // so equality with q163 (which folds held−old+new count partials)
    // is the fold law at a second, DataFrame-free vantage point
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bound = graft.queries.TextQueries.DeleteBound
      def upd(id: Long): Boolean =
        ((id * 1103515245L + 12345L) % 2147483647L) < bound
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .map { case (id, src, text) =>
          (id, src, if (upd(id)) text.substring(0, text.length / 2) else text)
        }
      val tgtSrc = graft.queries.PipelineQueries.DsirTargetSrc
      val tgtDims = docs.filter(_._2 == tgtSrc).flatMap(x => dims(x._3))
      val ct = tgtDims.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val nt = tgtDims.length.toLong
      val pool = docs.filter(x => x._2 != tgtSrc && dims(x._3).nonEmpty)
      val poolDims = pool.flatMap(x => dims(x._3))
      val cs = poolDims.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val ns = poolDims.length.toLong
      val scored = pool.map { case (id, src, text) =>
        val ds = dims(text)
        val sb = ds.map(dm => bitlen((ns + B) / (cs(dm) + 1))).sum
        val tb = ds.map(dm => bitlen((nt + B) / (ct.getOrElse(dm, 0L) + 1))).sum
        val md = (1000L * (sb - tb)) / ds.length
        (id, src, ds.length.toLong, sb, tb, md)
      }.sortBy(_._1)
      val k = (scored.length / 10).toLong
      val selIds = scored.sortBy(x => (-x._6, x._1)).take(k.toInt).map(_._1).toSet

      val got = SparkEntry.queries("q163_dsir_update")(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7)))
      val want = scored.map(x =>
        (x._1, x._2, x._3, x._4, x._5, x._6, if (selIds(x._1)) 1 else 0,
          if (upd(x._1)) 1 else 0))
      assert(got.toSeq === want.toSeq,
        s"q163's folded selection diverged from the from-scratch model at $d")

      // non-vacuity IN-SPEC: the wave genuinely moves the selection
      val base = SparkEntry.queries("q158_dsir_select")(spark, d).collect()
        .map(r => r.getLong(0) -> r.getInt(6)).toMap
      val flips = want.count(x => base(x._1) != x._7)
      assert(flips > 0, "the update wave flipped no selection flag — vacuous")
    }
    queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
