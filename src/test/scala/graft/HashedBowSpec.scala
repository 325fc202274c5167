package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q97 (hashed bag-of-words retrieval) beyond the
  * DuckDB oracle: vectorization and ranking recomputed from raw STRINGS
  * in plain Scala. Query and oracle share the token-hash construction;
  * the model re-derives dims, signs, counts, norms, and the top-5
  * cosine ranking from first principles, so a drifted dim/sign layout
  * or a broken sparse-zero drop would surface even if both engines
  * drifted together.
  */
class HashedBowSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L
  private val D = graft.queries.TextQueries.BowDims

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  test("q97 retrieval equals a string-level Scala model") {
    val out = SparkEntry.queries("q97_hashed_bow")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

    // signed hashed-BoW vectors: dim = h mod D, sign from the next bit
    val vecs: Map[Long, Map[Int, Long]] = docs.map { case (id, t) =>
      val v = t.split(" ", -1).foldLeft(Map.empty[Int, Long]) { (m, tok) =>
        val h = polyHash(tok)
        val dim = (h % D).toInt
        val sgn = 1L - 2L * ((h / D) % 2)
        m.updated(dim, m.getOrElse(dim, 0L) + sgn)
      }.filter(_._2 != 0L)
      id -> v
    }.toMap
    val n2: Map[Long, Long] = vecs.map { case (id, v) =>
      id -> v.values.map(x => x * x).sum }

    // seeded query sample: global 5 smallest by (LCG priority, id)
    val qids = vecs.keys.toSeq
      .sortBy(id => ((id * 1103515245L + 12345L) % 2147483647L, id))
      .take(graft.queries.TextQueries.BowNQueries)

    val expect = qids.sorted.flatMap { q =>
      val vq = vecs(q)
      val scored = vecs.toSeq.filter(_._1 != q).flatMap { case (id, v) =>
        val dot = vq.keysIterator.map(k => vq(k) * v.getOrElse(k, 0L)).sum
        if (vq.keySet.intersect(v.keySet).isEmpty) None
        else Some((id, dot,
          dot.toDouble / math.sqrt(n2(id).toDouble * n2(q).toDouble)))
      }
      scored.sortBy { case (id, _, cos) => (-cos, id) }
        .take(graft.queries.TextQueries.BowTopK)
        .zipWithIndex
        .map { case ((id, dot, cos), i) => (q, i + 1, id, dot, cos) }
    }

    assert(out.toSeq == expect, "q97 diverges from the string-level model")
    // the signed trick must bind at spec scale: some dimension holds
    // tokens of both signs (cancellation), else the ± bit is vacuous
    val cancels = docs.exists { case (_, t) =>
      t.split(" ", -1).groupBy(tok => (polyHash(tok) % D).toInt)
        .exists { case (_, toks) =>
          toks.map(tok => (polyHash(tok) / D) % 2).distinct.length > 1 }
    }
    assert(cancels, "no sign collisions at spec scale — ± bit vacuous")
    // and dimension collisions must exist (D=64 << distinct tokens)
    val collides = vecs.values.exists(_.nonEmpty) && {
      val toks = docs.flatMap(_._2.split(" ", -1)).distinct
      toks.groupBy(tok => (polyHash(tok) % D).toInt).exists(_._2.length > 1)
    }
    assert(collides, "no dim collisions — hashing trick unexercised")
  }
}
