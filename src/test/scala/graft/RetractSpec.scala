package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q153 (decremental aggregate maintenance).
  * The corpus exercises the algebraic-subtract path and both rescan
  * flags (measured: 4 min-rescans / 3 max-rescans at sf0.01, every
  * source loses ≥1 doc, none dies) — so the two corpus-DORMANT
  * branches are pinned here on synthetic frames through the same
  * [[graft.queries.PipelineQueries.statsRetractCore]] plan: an
  * untouched source passes through unchanged with both flags 0, and a
  * source whose every doc is deleted disappears from the output.
  */
class RetractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def run(rows: Seq[(Long, String, Long, Long, Boolean)]) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "source", "n_chars", "nt", "dead")
    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(d: org.apache.spark.sql.DataFrame) = { locals += d.persist(); d }
    val out = graft.queries.PipelineQueries.statsRetractCore(df, hold)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6)))
    locals.foreach(_.unpersist(false))
    out.toSeq
  }

  test("untouched source passes through unchanged, flags 0 (corpus-dormant branch)") {
    val out = run(Seq(
      (1L, "a", 10L, 5L, false), (2L, "a", 30L, 7L, false),
      (3L, "b", 20L, 4L, true), (4L, "b", 40L, 6L, false)))
    // source a: no deletion — held stats survive verbatim, no rescan
    assert(out.contains(("a", 2L, 12L, 10L, 30L, 0, 0)))
    // source b: deleted doc held the min (not the max) — subtract +
    // min-only rescan
    assert(out.contains(("b", 1L, 6L, 40L, 40L, 1, 0)))
  }

  test("source death drops the row (corpus-dormant branch)") {
    val out = run(Seq(
      (1L, "a", 10L, 5L, true), (2L, "a", 30L, 7L, true),
      (3L, "b", 20L, 4L, false)))
    assert(out.map(_._1) === Seq("b"))
    assert(out.head === (("b", 1L, 4L, 20L, 20L, 0, 0)))
  }

  test("interior deletion keeps extremes without rescan") {
    val out = run(Seq(
      (1L, "a", 10L, 2L, false), (2L, "a", 20L, 3L, true),
      (3L, "a", 30L, 4L, false)))
    assert(out === Seq(("a", 2L, 6L, 10L, 30L, 0, 0)))
  }

  // ---- q159 (update maintenance) corpus-dormant branches through the
  // same factored core: rows are (source, n_chars, nt, upd, u_nc, u_nt)
  private def runUpd(rows: Seq[(String, Long, Long, Boolean, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("source", "n_chars", "nt", "upd", "u_nc", "u_nt")
    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(d: org.apache.spark.sql.DataFrame) = { locals += d.persist(); d }
    val out = graft.queries.PipelineQueries.statsUpdateCore(df, hold)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7)))
    locals.foreach(_.unpersist(false))
    out.toSeq
  }

  test("q159 core: untouched source passes through; new-content MAX folds in (corpus-dormant)") {
    val out = runUpd(Seq(
      ("a", 10L, 5L, false, 0L, 0L), ("a", 30L, 7L, false, 0L, 0L),
      // b: interior doc updated; its NEW content exceeds the old max —
      // the greatest() must fold the wave partial, no rescan fires
      ("b", 20L, 4L, false, 0L, 0L), ("b", 25L, 5L, true, 60L, 9L),
      ("b", 40L, 6L, false, 0L, 0L)))
    assert(out.contains(("a", 2L, 12L, 10L, 30L, 0L, 0, 0)),
      "untouched source changed under an update wave")
    assert(out.contains(("b", 3L, 19L, 20L, 60L, 1L, 0, 0)),
      "new-content maximum not folded from the wave partials")
  }

  test("q159 core: fully-updated source — extremes come from new content alone (corpus-dormant)") {
    val out = runUpd(Seq(
      ("a", 10L, 5L, true, 33L, 3L), ("a", 30L, 7L, true, 44L, 4L),
      ("b", 20L, 4L, false, 0L, 0L)))
    // both extremes were attained by updated docs → both rescans fire,
    // the unchanged-rows rescan is EMPTY, and the extremes coalesce to
    // the new content's
    assert(out.contains(("a", 2L, 7L, 33L, 44L, 2L, 1, 1)),
      "fully-updated source did not take its extremes from the new content")
    assert(out.contains(("b", 1L, 4L, 20L, 20L, 0L, 0, 0)))
  }

  test("q159 core: extreme-holder update rescans the unchanged rows only") {
    val out = runUpd(Seq(
      // the min holder updates to a mid value: min must rescan to 20,
      // max stays algebraic
      ("a", 10L, 2L, true, 25L, 3L), ("a", 20L, 3L, false, 0L, 0L),
      ("a", 30L, 4L, false, 0L, 0L)))
    assert(out === Seq(("a", 3L, 10L, 20L, 30L, 1L, 1, 0)))
  }
}
