package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows, every query has its
  * oracle aliases consistent, and the harness maps stay in sync.
  */
class EntrySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("t1 smoke: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.subsetOf(o), s"queries without oracles: ${q.diff(o)}")
  }

  test("every query runs and returns at least one row at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    // q31/q32/q40 near-dup pair sets may legitimately be empty at the
    // smallest SF; everything else must produce rows
    val allowedEmpty = Set("q31_neardup_minhash", "q32_ngram_jaccard",
      "q40_embedding_neardup", "q41_simhash_dedup")
    assert(empties.toSet.subsetOf(allowedEmpty), s"unexpected empty results: $empties")
  }
}
