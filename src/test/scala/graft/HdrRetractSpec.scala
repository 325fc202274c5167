package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q161 (HDR-sketch retraction). The corpus
  * exercises bin subtraction, bin drops, and a p50 bracket move
  * (measured: 14–18 bins drop, one group's p50 moves per SF) — the
  * corpus-dormant branches are pinned here on synthetic frames through
  * the same [[graft.queries.PipelineQueries.hdrRetractCore]] plan: a
  * TAIL-concentrated delete moves the p99 bracket (a uniform 12.8%
  * delete never does), a fully-deleted group disappears, and an
  * untouched group reads back its held sketch with zero flags.
  */
class HdrRetractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def run(rows: Seq[(String, Long, Boolean)]) = {
    import spark.implicits._
    val df = rows.toDF("grp", "vc", "dead")
    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(d: org.apache.spark.sql.DataFrame) = { locals += d.persist(); d }
    val out = graft.queries.PipelineQueries.hdrRetractCore(df, hold)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getInt(11), r.getInt(12), r.getInt(13)))
      .toMap
    locals.foreach(_.unpersist(false))
    out
  }

  test("tail delete moves p99; group death drops the row; untouched group reads held") {
    val a = (1L to 100L).map(v => ("a", v * 37L, v >= 95L)) // tail dead
    val b = (1L to 10L).map(v => ("b", v * 37L, true))      // all dead
    val c = (1L to 50L).map(v => ("c", v * 37L, false))     // untouched
    val out = run(a ++ b ++ c)
    assert(out.keySet === Set("a", "c"), "fully-deleted group survived")
    val (an, andel, _, _, _, a99) = out("a")
    assert(an === 94L && andel === 6L)
    assert(a99 === 1, "tail-concentrated delete did not move the p99 bracket")
    val (cn, cndel, cdrop, c50, c90, c99) = out("c")
    assert((cn, cndel, cdrop, c50, c90, c99) === ((50L, 0L, 0L, 0, 0, 0)),
      "untouched group did not read back its held sketch unchanged")
  }

  /** q166 (HDR UPDATE) twin: the corpus-dormant moved90 branch, a
    * tail-extending update that BIRTHS a bin past the old max, and the
    * untouched-group identity — all through the same
    * [[graft.queries.PipelineQueries.hdrUpdateCore]] plan. Expected
    * values pre-computed with integer bin math (bins = bitlen·16 +
    * sub-bin; re-price = (vc·11) DIV 10).
    */
  test("update: mid-mass re-price moves all three brackets; tail update births a bin; untouched holds") {
    import spark.implicits._
    // a: 10% re-price of v∈[50,95] — every bracket moves; 2 born, 2 dropped
    val a = (1L to 100L).map(v => ("a", v * 37L, v >= 50L && v <= 95L))
    // b: only the max re-prices — p99 moves alone; 1 born (past old max)
    val b = (1L to 20L).map(v => ("b", v * 1000L, v == 20L))
    val c = (1L to 50L).map(v => ("c", v * 37L, false)) // untouched
    val df = (a ++ b ++ c).toDF("grp", "vc", "upd")
    val locals = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    def hold(d: org.apache.spark.sql.DataFrame) = { locals += d.persist(); d }
    val out = graft.queries.PipelineQueries.hdrUpdateCore(df, hold)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getInt(12), r.getInt(13), r.getInt(14)))
      .toMap
    locals.foreach(_.unpersist(false))
    // (n, n_upd, born, dropped, moved50, moved90, moved99)
    assert(out("a") === ((100L, 46L, 2L, 2L, 1, 1, 1)),
      "mid-mass re-price did not move all three brackets")
    assert(out("b") === ((20L, 1L, 1L, 1L, 0, 0, 1)),
      "tail re-price did not birth a bin / move p99 alone")
    assert(out("c") === ((50L, 0L, 0L, 0L, 0, 0, 0)),
      "untouched group did not read back its held sketch unchanged")
  }
}
