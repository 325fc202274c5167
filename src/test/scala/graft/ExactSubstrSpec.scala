package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q122 (longest verbatim token run per candidate
  * pair): the query and its oracle both work on gram HASHES and the
  * diagonal-islands formulation, so this model recomputes the longest
  * common token substring per pair with a direct DP over the token
  * STRINGS — an algorithmically different method on uncollided data —
  * plus the total gram-match count from string grams. A dual-residue
  * collision or an islands bug (off-by-one diagonals, broken run
  * grouping) surfaces here.
  */
class ExactSubstrSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q122 equals the token-string DP model; run lengths spread") {
    val out = SparkEntry.queries("q122_exact_substr")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out.nonEmpty, "no candidate pairs at spec scale — vacuous")

    val toks = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap

    def grams(ts: Seq[String]): Seq[String] =
      if (ts.length < 3) Seq.empty else ts.sliding(3).map(_.mkString(" ")).toSeq

    // DP longest common substring over tokens
    def lcsRun(a: Seq[String], b: Seq[String]): Int = {
      var best = 0
      val prev = Array.fill(b.length + 1)(0)
      for (i <- 1 to a.length) {
        var diagVal = 0 // prev(j-1) before this row overwrote it
        for (j <- 1 to b.length) {
          val tmp = prev(j)
          prev(j) = if (a(i - 1) == b(j - 1)) diagVal + 1 else 0
          if (prev(j) > best) best = prev(j)
          diagVal = tmp
        }
      }
      best
    }

    for ((da, db, nMatch, nRuns, maxRun) <- out) {
      val (ga, gb) = (grams(toks(da)), grams(toks(db)))
      val gbCount = gb.groupBy(identity).view.mapValues(_.size).toMap
      val expMatch = ga.map(g => gbCount.getOrElse(g, 0).toLong).sum
      assert(nMatch == expMatch, s"($da,$db): n_match $nMatch vs string model $expMatch")
      // a shared token run of R >= 3 tokens IS R-2 consecutive diagonal
      // gram matches, so the two formulations agree exactly whenever the
      // pair has any match at all (every output pair does)
      val expRun = lcsRun(toks(da), toks(db))
      assert(maxRun == expRun, s"($da,$db): max_run_tokens $maxRun vs DP $expRun")
      assert(nRuns >= 1 && nRuns <= nMatch)
    }
    val runs = out.map(_._5)
    assert(runs.min < runs.max, "all pairs share the same max run — weakly exercised")
    // both sides of the documented 20-token cut must stay populated
    // (measured: min 3 / max 95 at sf0.001 on banding pairs)
    assert(runs.max >= 20, "no pair reaches the ExactSubstr-scale run — unexpected for this corpus")
    assert(runs.min < 20, "no pair below the 20-token cut — the threshold no longer discriminates")
  }
}
