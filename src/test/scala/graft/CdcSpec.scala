package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cdc

/** Content-defined chunking: the resync property CDC exists for, proven
  * on a DETERMINISTIC INSERTION fixture (this corpus's near-dups are
  * scattered substitutions, so CDC was measured vacuous on it and
  * deliberately not oracled — PLANS.md round 8; the fixture is the
  * dormant-branch discipline of q114/q142), plus the partition
  * invariants on real data and the standing vacuity claim itself.
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val W = 8        // rolling window (tokens)
  private val D = 16L      // boundary divisor → expected chunk ≈ 16 tokens
  private val FixedW = 16  // fixed-size comparator chunk

  /** Deterministic base doc + single-token insertions at spread-out
    * positions — the near-dup shape (file prepend/edit-insert) where
    * fixed-size chunking desynchronizes and CDC re-locks.
    */
  private def insertionFixture: Seq[(Long, String)] = {
    val base = (0 until 300).map(j => s"w${(j * 7 + (j * j) % 13) % 53}")
    // doc k inserts k tokens at position 20k: every variant's tail is
    // shifted by a DIFFERENT offset (k < FixedW, so no two variants'
    // fixed chunks re-align with each other either — a same-length
    // insertion would let the shifted tails collide pairwise and mask
    // the desync this fixture exists to show)
    val variants = (1 to 12).map { k =>
      val at = 20 * k
      val ins = (0 until k).map(i => s"ins${k}_$i")
      (k.toLong, (base.take(at) ++ ins ++ base.drop(at)).mkString(" "))
    }
    (0L, base.mkString(" ")) +: variants
  }

  test("insertion fixture: CDC resyncs after the shift, fixed-size does not") {
    import spark.implicits._
    val docs = insertionFixture.toDF("doc_id", "text")
    val cdcRate = Cdc.dupChunkRate(Cdc.chunks(docs, W, D))
    val fixedRate = Cdc.dupChunkRate(Cdc.fixedChunks(docs, FixedW))
    // before the insertion point both schemes share chunks with the
    // base; AFTER it only CDC re-locks — the gap is the whole point
    assert(cdcRate > fixedRate + 0.3,
      f"CDC $cdcRate%.3f must clearly beat fixed $fixedRate%.3f on insertions")
    assert(cdcRate > 0.5,
      f"CDC rate $cdcRate%.3f — boundaries failed to resync across the insertion")
  }

  test("chunks partition each document exactly (real corpus)") {
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val ch = Cdc.chunks(docs, W, D).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val texts = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(ch.nonEmpty)
    for ((id, rows) <- ch) {
      val sorted = rows.sortBy(_.getAs[Int]("chunk_ix"))
      val n = texts(id).split(" ", -1).length
      assert(sorted.head.getAs[Int]("lo") == 1)
      assert(sorted.last.getAs[Int]("hi") == n)
      // contiguous, non-overlapping: each chunk starts one past the last
      for (Array(a, b) <- sorted.sliding(2))
        assert(b.getAs[Int]("lo") == a.getAs[Int]("hi") + 1,
          s"gap/overlap in doc $id at chunk ${b.getAs[Int]("chunk_ix")}")
      assert(sorted.map(_.getAs[Long]("n_tokens")).sum == n.toLong)
    }
  }

  test("the standing vacuity claim: no insertion-style resync win on THIS corpus") {
    // round 8 measured CDC vacuous here (substitution-style near-dups —
    // no resync advantage); with THESE parameters the raw rates differ a
    // few points (CDC's variable-size chunks include tiny ones that dup
    // trivially), so the live tripwire is the GAP staying far below the
    // insertion fixture's (>0.3): if a corpus regeneration ever makes
    // insertions dominate, the gap blows past this bound and the
    // operator should be promoted to an oracled query
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val cdcRate = Cdc.dupChunkRate(Cdc.chunks(docs, W, D))
    val fixedRate = Cdc.dupChunkRate(Cdc.fixedChunks(docs, FixedW))
    assert(cdcRate < fixedRate + 0.1,
      f"CDC $cdcRate%.3f far above fixed $fixedRate%.3f — corpus shape changed, " +
        "revisit the round-8 vacuity decision")
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
