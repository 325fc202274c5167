package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guards for q80 (long-gram eval decontamination), q81
  * (duplicated-span coverage), and q82 (cluster-balanced sample) beyond
  * the DuckDB oracle: q80/q81 are checked against brute-force models
  * built from gram STRINGS (the queries and oracle both hash — a
  * string-level model is algorithm-independent on both axes and would
  * even surface a polynomial-hash collision), q82's quota + draw
  * against the plain-Scala largest-remainder model given the oracled
  * cell assignment.
  */
class DecontamSpanSampleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  // ShingleHash tokenization: split on single spaces, trailing empties kept
  private def gramStrings(text: String, k: Int): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < k) Seq.empty
    else w.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSeq
  }

  private def docsOf(): Seq[(Long, String)] =
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  test("q80 rows equal the brute-force long-gram eval-overlap model") {
    val out = SparkEntry.queries("q80_ngram_decontam")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "DecontArity vacuous at spec scale — no leakage found")

    val k = graft.queries.TextQueries.DecontArity
    val docs = docsOf()
    val gs = docs.map { case (id, t) => id -> gramStrings(t, k).toSet }
      .filter(_._2.nonEmpty).toMap
    val evalDocs = gs.filter { case (id, _) => id % 10 == 0 }
    val model = for {
      (id, g) <- gs.toSeq if id % 10 != 0
      shared = evalDocs.toSeq
        .map { case (eid, eg) => (eid, (g & eg).size) }
        .filter(_._2 > 0)
      if shared.nonEmpty
    } yield {
      val hit = evalDocs.values.foldLeft(Set.empty[String])(_ ++ _) & g
      val (topEval, topShared) = shared.minBy { case (eid, ns) => (-ns, eid) }
      (id, g.size, hit.size.toLong, shared.size.toLong, topEval, topShared.toLong)
    }
    val got = out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got == model.sortBy(_._1), "q80 diverges from the string-level model")
    for (r <- out)
      assert(r.getDouble(6) == r.getLong(2).toDouble / r.getInt(1))
  }

  test("q81 coverage equals the brute-force interval-union model") {
    val out = SparkEntry.queries("q81_dup_spans")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val k = graft.queries.TextQueries.SpanArity
    val docs = docsOf()
    assert(out.length == docs.length, "one row per document, zero-filled")

    val pos = docs.map { case (id, t) => id -> gramStrings(t, k) }.toMap
    val docsPerGram = pos.toSeq
      .flatMap { case (id, gsq) => gsq.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val model = docs.map { case (id, t) =>
      val n = t.split(" ", -1).length
      val covered = new Array[Boolean](n)
      for ((g, i) <- pos(id).zipWithIndex if docsPerGram(g).size > 1)
        for (j <- i until math.min(i + k, n)) covered(j) = true
      (id, n, covered.count(identity).toLong)
    }
    val got = out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got == model.sortBy(_._1), "q81 diverges from the interval-union model")
    assert(got.exists(_._3 > 0), "SpanArity vacuous at spec scale")
    assert(got.exists(_._3 == 0), "no clean docs — coverage check degenerate")
    for (r <- out) {
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getInt(1))
      assert(r.getInt(4) == (if (r.getLong(2) * 10 >= r.getInt(1) * 3) 1 else 0))
    }
  }

  test("q87 flags exactly the train docs with a verified eval near-dup (vs q51 pairs)") {
    val out = SparkEntry.queries("q87_fuzzy_decontam")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val flagged = out.filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "no eval near-dups at spec scale — vacuous")
    assert(out.exists(_.getInt(2) == 0), "everything flagged — degenerate")
    // q51's verified pair set, restricted to pairs straddling the split,
    // is an independent derivation of the same flag set (the occupancy
    // cap binds on neither at spec scale)
    val pairs = SparkEntry.queries("q51_simhash64")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val straddle = pairs.flatMap { case (a, b) =>
      if (a % 10 == 0 && b % 10 != 0) Some(b)
      else if (b % 10 == 0 && a % 10 != 0) Some(a)
      else None
    }.toSet
    assert(flagged == straddle,
      s"flag set diverges from q51's straddling pairs: " +
        s"only-q87=${(flagged -- straddle).take(5)} only-q51=${(straddle -- flagged).take(5)}")
    // flagged rows carry a consistent nearest eval item
    for (r <- out if r.getInt(2) == 1) {
      assert(r.getLong(4) % 10 == 0, "nn_eval must be an eval doc")
      assert(r.getInt(3) >= 0 &&
        r.getInt(3) <= graft.queries.TextQueries.SimhashMaxDist)
    }
  }

  test("q82 draws each cell's largest-remainder quota in seeded hash order") {
    import graft.ops.Ivf
    val out = SparkEntry.queries("q82_balanced_sample")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()

    // cell assignment from the shared (q42/q76-oracled) machinery; quota
    // and draw re-derived in plain Scala
    val emb = Ivf.prep(spark.read.parquet(s"$d/embeddings.parquet"))
    val asg = Ivf.assignAll(emb, Ivf.trainCells(emb))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    spark.catalog.clearCache()
    val budget = graft.queries.TextQueries.SampleBudget
    val sizes = asg.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
    val rs = sizes.map { case (c, n) =>
      c -> math.floor(math.sqrt(n.toDouble) * 1e8).toLong }
    val wTotal = rs.values.sum
    val q0 = rs.map { case (c, r) => c -> (budget * r) / wTotal }
    val topUp = rs.map { case (c, r) => c -> (budget * r) % wTotal }
      .toSeq.sortBy { case (c, rm) => (-rm, c) }
      .take((budget - q0.values.sum).toInt).map(_._1).toSet
    val quota = q0.map { case (c, v) => c -> (v + (if (topUp(c)) 1L else 0L)) }
    assert(quota.values.sum == budget)

    val model = asg.groupBy(_._2).toSeq.flatMap { case (c, xs) =>
      val drawn = xs.map(_._1)
        .sortBy(id => ((id * 1103515245L + 12345L) % 10000L, id))
        .take(quota(c).toInt)
      drawn.zipWithIndex.map { case (id, i) =>
        (c, (i + 1).toLong, id, (id * 1103515245L + 12345L) % 10000L,
          sizes(c), quota(c))
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == model, "q82 diverges from the quota + draw model")
    // the rank filter must BIND at spec scale (some cell larger than
    // its quota) and the sqrt temperature must leave every nonempty
    // cell represented when its quota allows
    assert(sizes.exists { case (c, n) => n > quota(c) },
      "budget never bound — the draw is the identity")
    assert(out.length == sizes.map { case (c, n) => math.min(n, quota(c)) }.sum)
  }
}
