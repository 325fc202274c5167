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
}
