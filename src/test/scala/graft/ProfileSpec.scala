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

  test("sketch mode: unfilled sketch is exact; all-null column reads 0") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b"), None: Option[String]),
      (None: Option[Long], Some("a"), None: Option[String]),
      (Some(3L), None: Option[String], None: Option[String]),
      (Some(7L), Some("a"), None: Option[String])
    ).toDF("x", "s", "z")
    val exact = graft.queries.MiscQueries.profileTable(df, "syn", Seq("x"), Seq("s", "z"))
      .orderBy("col_name").collect()
    val sk = graft.queries.MiscQueries.profileTable(df, "syn", Seq("x"), Seq("s", "z"),
        sketchK = Some(graft.queries.MiscQueries.ProfileKmvK))
      .orderBy("col_name").collect()
    // distinct counts per column are far below k, so the sketch never
    // fills and its size IS the exact count — including the all-null
    // column, whose missing sketch row must coalesce to 0, not null
    assert(sk.map(r => (r.getString(1), r.getLong(4))).toSeq ==
      exact.map(r => (r.getString(1), r.getLong(4))).toSeq)
    assert(sk.find(_.getString(1) == "z").get.getLong(4) == 0L)
    // every non-distinct stat matches exact mode bit-for-bit
    assert(sk.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      exact.map(r => (r.getLong(2), r.getLong(3))).toSeq)
  }

  test("q124 forced sketch: both estimate branches live; error bounded") {
    val d = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q109_profile")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val sk = SparkEntry.queries("q124_profile_sketch")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val k = graft.queries.MiscQueries.ProfileKmvK
    val (filled, unfilled) = sk.partition(r => exact((r.getString(0), r.getString(1))) >= k)
    // non-vacuity of BOTH branches at sf0.001: event_id/ts_us/doc_id fill
    // the 64-sketch, lang/source/o_orderstatus don't
    assert(filled.nonEmpty && unfilled.nonEmpty)
    unfilled.foreach { r =>
      assert(r.getLong(4) == exact((r.getString(0), r.getString(1))),
        s"unfilled sketch must be exact at ${r.getString(1)}")
    }
    filled.foreach { r =>
      val e = exact((r.getString(0), r.getString(1))).toDouble
      val got = r.getLong(4).toDouble
      assert(math.abs(got - e) / e <= 0.5,
        s"KMV estimate off by >50% at ${r.getString(1)}: $got vs $e")
    }
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
