package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q96 (near-dup detector quality audit) beyond
  * the DuckDB oracle: the whole audit — minhash banding, ground-truth
  * pair universe, exact Jaccard, decile rollup, S-curve expectation —
  * recomputed from raw STRINGS in plain Scala. Query and oracle share
  * the gram-hash construction; the model hashes independently from
  * first principles, so a drifted minhash family, band layout, cap, or
  * df-cap would all surface here even if both engines drifted together.
  */
class DedupAuditSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private val P = 1000000007L

  private def polyHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)

  test("q96 audit equals a string-level Scala model of the full confusion rollup") {
    val out = SparkEntry.queries("q96_dedup_audit")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

    // distinct 3-gram string sets per doc (docs with <3 tokens excluded,
    // mirroring the size(hs)>0 signature filter)
    val grams: Map[Long, Set[String]] = docs.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      if (w.length < 3) None
      else Some(id -> w.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap

    // the deployed detector, re-derived: 8 minhashes over gram hashes,
    // 4 bands of 2, occupancy cap, pairs sharing any surviving bucket
    val mh: Map[Long, IndexedSeq[Long]] = grams.map { case (id, gs) =>
      val hs = gs.map(polyHash)
      id -> (0 until 8).map(j => hs.map(h => ((3 + 2 * j) * h + (7 + 5 * j)) % P).min)
    }
    val buckets = mh.toSeq.flatMap { case (id, m) =>
      (0 until 4).map(b => ((b, m(2 * b) * P + m(2 * b + 1)), id))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size <= graft.queries.TextQueries.BandOccCap)
    val detected: Set[(Long, Long)] = buckets.values.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

    // ground-truth universe: pairs sharing >=1 rare gram (df <= 64)
    val df = grams.toSeq.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val rare = df.filter(_._2 <= 64).keys.toSet
    val postings = grams.toSeq.flatMap { case (id, gs) =>
      gs.filter(rare).map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2))
    val universe: Set[(Long, Long)] = postings.values.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

    val byDecile = universe.toSeq.map { case (a, b) =>
      val ga = grams(a); val gb = grams(b)
      val ni = (ga & gb).size
      val j = ni.toDouble / (ga.size + gb.size - ni)
      val u = 1.0 - j * j
      (math.floor(j * 10).toInt, detected((a, b)), 1.0 - u * u * u * u)
    }.groupBy(_._1)
    val expect = byDecile.toSeq.map { case (jb, rows) =>
      val n = rows.size.toLong
      val caught = rows.count(_._2).toLong
      val qsum = rows.map(r => math.floor(r._3 * 1e8).toLong).sum
      (jb, n, caught, caught.toDouble / n, qsum.toDouble / 1e8 / n)
    }.sortBy(_._1)

    assert(out.toSeq == expect, "q96 audit diverges from the string-level model")
    // the audit must bind both ways at spec scale: the top decile
    // catches real near-dups, the bottom decile has banding false
    // alarms AND misses (measured 11/11997 at sf0.001)
    assert(out.nonEmpty && out.last._3 > 0, "no near-dups caught — vacuous")
    assert(out.head._3 < out.head._2, "bottom decile fully caught — implausible")
    assert(out.head._3 > 0, "no banding false alarms at low J — S-curve floor not exercised")
  }
}
