package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guards for q104 (interval-overlap join via temporal
  * binning) and q105 (prefix-filtering exact set-similarity join):
  * each recomputed brute-force from raw parquet in plain Scala — the
  * binned/prefix-filtered plans must emit EXACTLY the brute-force
  * answer (both are pure optimizations, zero recall loss allowed).
  * q105's model works on gram STRINGS, so a dual-residue hash
  * collision in the plan would surface here (the q96 birthday lesson).
  */
class OverlapSimJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q104 equals brute-force interval overlap; bucket straddle binds") {
    val out = SparkEntry.queries("q104_session_overlap")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gapUs = 30L * 60 * 1000000
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var sess = 0L; var prev = Long.MinValue
      val tagged = ordered.map { e =>
        if (prev == Long.MinValue || e._3 - prev > gapUs) sess += 1
        prev = e._3
        (sess, e._3)
      }
      tagged.groupBy(_._1).map { case (sid, ts) =>
        (u, sid, ts.map(_._2).min, ts.map(_._2).max)
      }
    }
    val expect = (for {
      a <- sessions; b <- sessions
      if a._1 < b._1 && a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._1, b._2,
      math.min(a._4, b._4) - math.max(a._3, b._3)))
      .sortBy(p => (p._1, p._2, p._3, p._4))

    assert(out.toSeq == expect, "q104 diverges from brute-force overlap")
    assert(expect.nonEmpty, "no overlapping sessions — vacuous")
    // the distinct() matters only if some session straddles an hour
    // bucket — prove the corpus exercises that path
    val B = graft.queries.AnalyticsQueries.OverlapBucketUs
    assert(sessions.exists(s => s._3 / B != s._4 / B),
      "no session straddles a bucket boundary — dedup unexercised")
  }

  test("q105 equals brute-force Jaccard over gram STRING sets; prefix filter complete and binding") {
    val out = SparkEntry.queries("q105_simjoin")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sets = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      id -> (if (toks.length < 3) Set.empty[String]
             else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty).toMap

    val ids = sets.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      i = (sets(a) & sets(b)).size.toLong if i > 0
      (ma, mb) = (sets(a).size.toLong, sets(b).size.toLong)
      if 8 * i >= 3 * (ma + mb)
    } yield (a, b, i, ma, mb, i.toDouble / (ma + mb - i)))
      .sortBy(p => (p._1, p._2))

    assert(out.toSeq == expect, "q105 diverges from the string-set Jaccard model")
    assert(expect.nonEmpty, "no similar pairs at spec scale — vacuous")

    // prefix-filter lemma, checked on strings: every qualifying pair
    // shares a gram in both prefixes, and the filter genuinely prunes
    val df = sets.values.toSeq.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val pref = sets.map { case (id, gs) =>
      val m = gs.size
      val p = m - ((3 * m + 4) / 5) + 1
      id -> gs.toSeq.sortBy(g => (df(g), g)).take(p).toSet
    }
    val cands = (for {
      a <- ids; b <- ids if a < b && (pref(a) & pref(b)).nonEmpty
    } yield (a, b)).toSet
    assert(expect.forall(p => cands((p._1, p._2))),
      "prefix filter dropped a qualifying pair — completeness violated")
    val sharing = (for {
      a <- ids; b <- ids if a < b && (sets(a) & sets(b)).nonEmpty
    } yield 1).size
    assert(cands.size < sharing,
      "prefix filter prunes nothing at spec scale — unexercised")
  }
}
