package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalDedup

/** Incremental batch dedup (q72 / ops.IncrementalDedup): the frozen
  * signature index is consumed from parquet — never rebuilt — and the
  * probe finds exactly the cross-split pairs a full q51 recompute on
  * the union finds.
  */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("probe of a parquet-frozen index equals the full recompute's cross-split pairs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val oldDocs = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val newDocs = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    val out = s"/tmp/graft_idx_${System.nanoTime()}"
    // build ONCE over the snapshot, freeze to parquet — the production
    // artifact a nightly crawl probes against
    IncrementalDedup.buildIndex(oldDocs, track = queries.tracked)
      .write.mode("overwrite").parquet(out)
    queries.releasePersisted()
    val frozen = spark.read.parquet(out)
    // the index carries signatures only: rebuilding from it is
    // structurally impossible, not merely avoided
    assert(frozen.columns.toSet ==
      Set("doc_id", "b0", "b1", "b2", "b3", "band", "key"),
      s"index schema leaked extra columns: ${frozen.columns.mkString(",")}")
    val probed = IncrementalDedup.probe(frozen, newDocs)
    // the frozen side enters the plan as a scan of the index files, and
    // the snapshot's documents are nowhere in it: exactly one scan of
    // documents.parquet (the new batch)
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(out).getName),
      "probe plan does not scan the frozen index")
    assert("documents\\.parquet".r.findAllIn(plan).size == 1,
      "probe re-scanned the snapshot corpus instead of the frozen index")
    val got = probed.as[(Long, Long, Int)].collect().toSet
    // independent expectation: q51's full pair recompute on the union,
    // restricted to pairs with exactly one new-batch member (caps don't
    // bind on the clean corpus, so build-time capping ≡ union capping)
    val expected = SparkEntry.queries("q51_simhash64")(spark, d)
      .as[(Long, Long, Int)].collect().toSeq
      .filter { case (a, b, _) => (a % 4 == 0) != (b % 4 == 0) }
      .map { case (a, b, dist) => if (a % 4 == 0) (a, b, dist) else (b, a, dist) }
      .toSet
    queries.releasePersisted()
    assert(got == expected, "probe pairs diverge from the full recompute")
    assert(got.nonEmpty, "fixture has no cross-split near-dup pairs — test is vacuous")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.catalog.clearCache()
  }
}
