package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Proves q96's at-scale sample mode (truth universe restricted to the
  * seeded doc sample) estimates the full audit: the sampled universe
  * must be a strict, non-trivial subset, and per-decile recall must
  * track the exhaustive measurement wherever the sample keeps enough
  * pairs to estimate from. Runs at sf0.01 — the scale the oracle gates
  * the full mode at — by forcing the sample bound the threshold would
  * apply on a 100 TB corpus.
  */
class Q96SampleModeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.01"

  test("sampled audit is a binding subset whose recall tracks the full audit") {
    val full = TextQueries.dedupAuditCore(spark, d, None)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    queries.releasePersisted()
    spark.catalog.clearCache()
    val samp = TextQueries.dedupAuditCore(spark, d, Some(TextQueries.AuditSampleBound))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    queries.releasePersisted()
    spark.catalog.clearCache()

    val fullPairs = full.values.map(_._1).sum
    val sampPairs = samp.values.map(_._1).sum
    assert(sampPairs > 0, "sample mode produced no truth pairs — vacuous")
    assert(sampPairs < fullPairs, "sample mode did not shrink the universe — not binding")
    // ~20% doc admission → ~4% of pairs; anything above 25% means the
    // bound is not actually restricting both endpoints
    assert(sampPairs.toDouble / fullPairs < 0.25,
      s"sampled universe too large ($sampPairs of $fullPairs) — endpoint restriction broken")

    // deciles the sample can estimate must agree with the exhaustive
    // recall within a tolerance consistent with a ~4% pair subsample
    val estimable = samp.filter(_._2._1 >= 30).keys.toSeq
    assert(estimable.nonEmpty, "no decile keeps >=30 sampled pairs — sample too small to audit")
    for (jb <- estimable) {
      // sampled postings ⊆ full postings under the shared full-corpus
      // df cap, so every sampled decile must exist in the full audit
      val rf = full.getOrElse(jb,
        fail(s"decile $jb exists only in sample mode — universe is not a subset"))._3
      val rs = samp(jb)._3
      assert(math.abs(rf - rs) <= 0.15,
        s"decile $jb: sampled recall $rs vs full $rf — estimator off")
    }

    // threshold wiring: test corpora run FULL (the oracled path)
    val n = Tables.documents(spark, d).count()
    assert(n <= TextQueries.AuditSampleThreshold,
      "test corpus exceeds the sample threshold — oracle would silently switch modes")
  }
}
