package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q160 (chunk-index maintenance under update).
  * The corpus exercises group shrink, death, and a keeper flip
  * (measured: 4–8 groups change, 3–7 die, 1 keeper flips per SF), but
  * a truncating re-crawl can never CREATE a dup group — so the
  * group-BIRTH branch is pinned here on a synthetic frame through the
  * same [[graft.queries.PipelineQueries.chunkUpdateCore]] plan, along
  * with keeper-flip and full-retraction shapes small enough to check by
  * hand. Chunks are 32 tokens every 24, so ≤32-token texts are exactly
  * one chunk.
  */
class ChunkUpdateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def run(rows: Seq[(Long, String, Boolean, String)]) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "upd", "new_text")
    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(d: org.apache.spark.sql.DataFrame) = { locals += d.persist(); d }
    val out = graft.queries.PipelineQueries.chunkUpdateCore(df, hold)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))
    locals.foreach(_.unpersist(false))
    out.toSeq
  }

  test("group birth: two docs re-crawled into the same content (corpus-dormant branch)") {
    val shared = words("n", 20)
    val out = run(Seq(
      (1L, words("a", 20), true, shared),
      (2L, words("b", 20), true, shared),
      (3L, words("c", 20), false, "")))
    // exactly one dup group exists — the born one — touched, with the
    // keeper at the smaller doc and NO keeper_changed (no old group)
    assert(out.length === 1)
    val g = out.head
    assert((g._2, g._3, g._4, g._5, g._6, g._7) === ((2L, 2L, 1L, 0, 1, 0)),
      s"born group wrong: $g")
  }

  test("keeper update passes the keeper to the next member; full retraction kills the group") {
    val shared = words("s", 20)
    val out = run(Seq(
      // group {1,2,3}: keeper doc 1 re-crawls AWAY — keeper must pass
      // to doc 2 with the flag set, copies drop to 2
      (1L, shared, true, words("x", 20)),
      (2L, shared, false, ""),
      (3L, shared, false, ""),
      // group {7,8}: BOTH members re-crawl away — the group dies
      (7L, words("t", 20), true, words("y", 20)),
      (8L, words("t", 20), true, words("z", 20))))
    assert(out.length === 1, s"expected one surviving group, got $out")
    val g = out.head
    assert((g._2, g._3, g._4, g._5, g._6, g._7) === ((2L, 2L, 2L, 0, 1, 1)),
      s"keeper hand-off wrong: $g")
  }

  test("untouched groups pass through with flags 0") {
    val shared = words("u", 20)
    val out = run(Seq(
      (1L, shared, false, ""), (2L, shared, false, ""),
      (9L, words("q", 20), true, words("r", 20))))
    assert(out === Seq(out.head))
    assert((out.head._2, out.head._4, out.head._6, out.head._7) === ((2L, 1L, 0, 0)))
  }
}
