package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q109 (per-column profiling). The driver corpus
  * has ZERO nulls in every profiled column (measured before wiring),
  * so the null-counting branch is dormant on real data — per the
  * q102/q103 discipline it is proven here on a synthetic frame
  * instead, alongside the stat semantics (distinct vs null interplay,
  * typed min/max).
  */
class ProfileSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("profileTable counts nulls/distincts and types min/max on a synthetic frame") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")),
      (None: Option[Long], Some("a")),
      (Some(3L), None: Option[String]),
      (Some(7L), Some("a"))
    ).toDF("x", "s")
    val out = graft.queries.MiscQueries.profileTable(df, "syn", Seq("x"), Seq("s"))
      .orderBy("col_name")
      .collect()
    assert(out.length == 2)
    val Array(sRow, xRow) = out
    assert(xRow.getString(1) == "x" && xRow.getLong(2) == 4 &&
      xRow.getLong(3) == 1 && xRow.getLong(4) == 2 &&
      xRow.getDouble(5) == 3.0 && xRow.getDouble(6) == 7.0 &&
      xRow.isNullAt(7) && xRow.isNullAt(8))
    assert(sRow.getString(1) == "s" && sRow.getLong(2) == 4 &&
      sRow.getLong(3) == 1 && sRow.getLong(4) == 2 &&
      sRow.isNullAt(5) && sRow.isNullAt(6) &&
      sRow.getString(7) == "a" && sRow.getString(8) == "b")
  }

  test("q109 covers every declared column once; corpus nulls stay zero") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q109_profile")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val declared = graft.queries.MiscQueries.ProfileCols
      .flatMap { case (t, num, str) => (num ++ str).map(t -> _) }
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq == declared.sorted)
    // the dormant-branch measurement: if the driver ever adds nulls,
    // this flips and the synthetic-only proof must graduate to corpus
    assert(out.forall(_.getLong(3) == 0L), "corpus now HAS nulls — revisit")
    assert(out.forall(r => r.getLong(4) > 0L))
  }
}
