package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{AnalyticsQueries, PipelineQueries}

/** Behavioral guards for q98 (kNN label-consistency audit), q99
  * (chunk-level exact dedup), and q100 (vocabulary coverage curve)
  * beyond the DuckDB oracle: each recomputed from raw parquet values
  * in plain Scala — a drifted neighbor rule, chunk derivation, or
  * histogram coverage formula would surface here even if both engines
  * drifted together.
  */
class CoverageAuditSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q98 audit equals a leave-one-out kNN model over raw vectors") {
    val out = SparkEntry.queries("q98_knn_label_audit")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toIndexedSeq))

    // index-order left fold, each element cast to double first (the
    // DotFold contract)
    def dot(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = rows.map { case (id, _, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = rows.map(r => r._1 -> r).toMap

    val qids = rows.map(_._1).sorted
      .sortBy(id => ((id * 1103515245L + 12345L) % 2147483647L, id))
      .take(AnalyticsQueries.KnnNq)

    val preds = qids.map { q =>
      val (_, qlab, qv) = byId(q)
      val top = rows.filter(_._1 != q)
        .map { case (id, lab, v) => (id, lab, dot(qv, v) / (nrm(q) * nrm(id))) }
        .sortBy { case (id, _, cos) => (-cos, id) }
        .take(AnalyticsQueries.KnnK)
      val votes = top.groupBy(_._2).view.mapValues(_.length).toSeq
      val pred = votes.minBy { case (lab, nv) => (-nv, lab) }._1
      (qlab, pred)
    }
    val expect = preds.groupBy(_._1).toSeq.map { case (lab, ps) =>
      val n = ps.length.toLong
      val ok = ps.count(p => p._2 == p._1).toLong
      (lab, n, ok, ok.toDouble / n)
    }.sortBy(_._1)

    assert(out.toSeq == expect, "q98 diverges from the kNN model")
    // the audit must measure something real both ways: some queries
    // classified correctly, some not (random-geometry corpus ≈ chance)
    assert(out.map(_._3).sum > 0, "zero correct predictions — audit floor unexercised")
    assert(out.map(r => r._2 - r._3).sum > 0, "all predictions correct — implausible here")
  }

  test("q112 hard negatives equal the brute-force triplet model; flag binds both ways") {
    val out = SparkEntry.queries("q112_hard_negatives")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getInt(7)))
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
    val expect = rows.filter(_._1 < graft.queries.AnalyticsQueries.MineNq)
      .sortBy(_._1).flatMap { case (q, ql, qv) =>
        def best(same: Boolean) = rows
          .filter(r => r._1 != q && (r._2 == ql) == same)
          .map(r => (dot(qv, r._3) / (nrm(q) * nrm(r._1)), r._1))
          .sortBy { case (c, id) => (-c, id) }.headOption
        (best(true), best(false)) match {
          case (Some((pc, pid)), Some((nc, nid))) =>
            Some((q, ql, pid, pc, nid, nc, pc - nc, if (nc > pc) 1 else 0))
          case _ => None
        }
      }
    assert(out.toSeq == expect.toSeq, "q112 diverges from the brute-force triplet model")
    assert(expect.exists(_._8 == 1) && expect.exists(_._8 == 0),
      "hard flag never varies — vacuous")
  }

  test("q99 chunk dedup equals a string-level chunk model") {
    val out = SparkEntry.queries("q99_chunk_dedup")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val W = PipelineQueries.ChunkW; val S = PipelineQueries.ChunkS
    val chunks = docs.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      (0 to (toks.length - 1) / S).map { c =>
        (id, c, sha(toks.slice(c * S, c * S + W).mkString(" ")))
      }
    }
    val expect = chunks.groupBy(_._3).toSeq
      .filter(_._2.length > 1)
      .map { case (h, occ) =>
        val keep = occ.map(o => (o._1, o._2)).min
        (h, occ.length.toLong, occ.map(_._1).distinct.length.toLong,
          keep._1, keep._2)
      }.sortBy(_._1)

    assert(out.toSeq == expect, "q99 diverges from the chunk model")
    assert(out.exists(_._3 > 1), "no cross-doc duplicated chunks — vacuous")
    assert(out.map(_._2).sum < chunks.length,
      "every chunk duplicated — implausible")
  }

  test("q100 coverage curve equals an explicit-sort model") {
    val out = SparkEntry.queries("q100_vocab_coverage")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    val occs = docs.flatMap { t =>
      val w = t.split(" ", -1)
      if (w.length < 3) Nil else w.sliding(3).map(_.mkString(" ")).toSeq
    }
    // explicit descending-count sort; ties share a count, so any tie
    // order yields the same prefix sums the histogram formula computes
    val counts = occs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map(_._2).sortBy(-_)
    val total = counts.sum
    val nTypes = counts.length.toLong
    val expect = PipelineQueries.CovKs.map { k =>
      val kEff = math.min(k, nTypes)
      val covered = counts.take(kEff.toInt).sum
      (k, kEff, nTypes, covered, total, covered.toDouble / total)
    }

    assert(out.toSeq == expect, "q100 diverges from the explicit-sort model")
    // the curve must be a real curve: strictly increasing, starting
    // well below full coverage
    assert(out.head._6 < 0.5 && out.last._6 > 0.9, "coverage curve degenerate")
    assert(out.sliding(2).forall(p => p(0)._6 < p(1)._6), "curve not increasing")
  }
}
