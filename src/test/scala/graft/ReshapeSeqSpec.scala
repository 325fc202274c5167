package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries

/** Behavioral guards for q102 (unpivot) and q103 (session-sequence
  * training pairs) beyond the DuckDB oracle: the unpivot must invert
  * the pivot exactly (long form ≡ a direct group-by against the dense
  * grid), and the sequence pairs must agree with a from-scratch Scala
  * sessionization AND with q26's session cardinalities (pairs per
  * session = n_events − 1 — drift between the training pairs and the
  * session dashboard would surface here).
  */
class ReshapeSeqSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q102 unpivot inverts the pivot: long form equals direct group-by on the dense grid") {
    val out = SparkEntry.queries("q102_unpivot")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val counts = spark.read.parquet(s"$d/events.parquet")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val users = counts.keys.map(_._1).toSeq.distinct.sorted
    val types = Seq("click", "error", "purchase", "signup", "view")
    val expect = for (u <- users; t <- types)
      yield (u, t, counts.getOrElse((u, t), 0L))

    assert(out.toSeq == expect, "q102 long form diverges from direct group-by")
    // THIS corpus is fully dense (every user has all 5 types, measured
    // at every SF) — the long form must be the complete grid
    assert(out.length == users.size * types.size, "long form is not the dense grid")
  }

  test("q102 densification binds: a sparse synthetic grid emits explicit zero cells") {
    import spark.implicits._
    val ev = Seq((1L, "click"), (1L, "view"), (2L, "error"))
      .toDF("user_id", "event_type")
    val out = graft.queries.MiscQueries.unpivotCounts(ev)
      .orderBy(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = Seq(
      (1L, "click", 1L), (1L, "error", 0L), (1L, "purchase", 0L),
      (1L, "signup", 0L), (1L, "view", 1L),
      (2L, "click", 0L), (2L, "error", 1L), (2L, "purchase", 0L),
      (2L, "signup", 0L), (2L, "view", 0L))
    assert(out.toSeq == expect, "sparse grid did not densify to explicit zeros")
  }

  test("q103 pairs equal a from-scratch sessionization model and q26's cardinalities") {
    val out = SparkEntry.queries("q103_session_seq")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))

    // Tables.events canonicalizes ts to ts_us whatever the parquet
    // physical type is (nanos-long vs timestamp[us] — it has changed
    // between testdata generations; never read events.ts raw in models)
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val gapUs = 30L * 60 * 1000000
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      var sess = 0L; var prev = Long.MinValue
      val tagged = ordered.map { e =>
        if (prev == Long.MinValue || e._3 - prev > gapUs) sess += 1
        prev = e._3
        (sess, e._4)
      }
      tagged.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (sid, ses) =>
        val types = ses.map(_._2)
        (2 to types.length).map { step =>
          val ctx = types.slice(math.max(0, step - 1 - AnalyticsQueries.SeqCtx), step - 1)
          (u, sid, step.toLong, ctx.mkString(" "), types(step - 1))
        }
      }
    }
    assert(out.toSeq == expect, "q103 diverges from the sessionization model")

    // consistency with the q26 dashboard: pairs per session = n_events - 1
    val q26 = SparkEntry.queries("q26_sessionize")(spark, d)
      .select(col("user_id"), col("sess"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pairCounts = out.groupBy(p => (p._1, p._2)).view.mapValues(_.length.toLong).toMap
    assert(q26.forall { case (k, n) => pairCounts.getOrElse(k, 0L) == n - 1 },
      "q103 pair counts disagree with q26 session sizes")
    // variable-length contexts bind on real data (length-1 at step 2,
    // length-2 at step 3); the SeqCtx=4 cap can't (max session = 3,
    // measured at every SF) — the synthetic test below proves it
    assert(out.exists(_._4.split(" ").length == 2) && out.exists(_._4.split(" ").length == 1),
      "variable-length contexts unexercised")
    assert(out.forall(_._4.split(" ").length <= AnalyticsQueries.SeqCtx))
  }

  test("q103 SeqCtx truncation binds on a synthetic 7-event session") {
    import spark.implicits._
    val ts0 = 1000000L
    val types = Seq("a", "b", "c", "d", "e", "f", "g")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (9L, i.toLong, ts0 + i * 1000000L, t) // 1 s apart — one session
    }.toDF("user_id", "event_id", "ts_us", "event_type")
    val out = graft.queries.AnalyticsQueries.sessionPairs(ev)
      .orderBy(col("step"))
      .collect().map(r => (r.getLong(2), r.getString(3), r.getString(4)))
    val expect = Seq(
      (2L, "a", "b"), (3L, "a b", "c"), (4L, "a b c", "d"),
      (5L, "a b c d", "e"),
      (6L, "b c d e", "f"),  // step 6: 'a' truncated out of the window
      (7L, "c d e f", "g"))
    assert(out.toSeq == expect, "SeqCtx truncation semantics wrong on long session")
  }
}
