package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q167 (LM-state retraction). The corpus
  * exercises count subtraction and flag flips (measured: 14/100 flags
  * flip at sf0.01) but NO vocabulary word dies there (31-word alphabet,
  * every word survives 87.2% of docs) — the cw→0 branch is pinned here
  * on synthetic trigram frames through the same
  * [[graft.queries.PipelineQueries.lmRetractOver]] plan, against an
  * independent from-scratch RETRAIN (direct recounts over the
  * survivors — a different code path than the fold), so the law
  * fold ≡ retrain is asserted where the corpus cannot.
  */
class LmRetractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("deleting the only doc holding a word shrinks |V|; fold ≡ from-scratch retrain") {
    import spark.implicits._
    // doc 1 is the ONLY holder of word "zzz" (3 occurrences); docs 2-3
    // share a common vocabulary; doc 1 dies.
    val train = Seq(
      (1L, "a b", "zzz"), (1L, "b zzz", "zzz"), (1L, "zzz zzz", "c"),
      (2L, "a b", "c"), (2L, "b c", "a"), (2L, "c a", "b"),
      (3L, "a b", "c"), (3L, "b c", "b"))
      .toDF("doc_id", "ctx", "w")
    val dead = train.filter(col("doc_id") === 1L)
    // the probe hits a surviving gram, a retracted-to-unseen gram, and
    // a never-seen gram
    val probe = Seq(
      (10L, "a b", "c"), (10L, "a b", "zzz"), (10L, "q q", "q"))
      .toDF("doc_id", "ctx", "w")

    val got = graft.queries.PipelineQueries.lmRetractOver(train, dead, probe)
      .collect().toSeq

    // |V_live|: train words {zzz, c, a, b}; zzz dies with doc 1 → 3
    assert(got.forall(_.getAs[Long]("v_live") == 3L),
      "the counted vocabulary did not retract the dying word")

    // fold ≡ retrain: recount the survivors directly (no subtraction)
    val live = train.filter(col("doc_id") =!= 1L)
    val want = graft.queries.PipelineQueries.lmScoreOver(probe,
        live.groupBy(col("ctx"), col("w")).agg(count(lit(1)).as("cb")),
        live.groupBy(col("ctx")).agg(count(lit(1)).as("cu")),
        live.select(col("w")).distinct().count())
      .withColumn("v_live", lit(3L))
      .orderBy(col("doc_id"))
      .collect().toSeq
    assert(got === want, "retraction fold diverged from the from-scratch retrain")

    // the retracted gram ("a b" → zzz) must now score as UNSEEN: doc 10
    // carries exactly the one never-seen + one retracted gram
    assert(got.head.getAs[Long]("n_unseen") === 2L,
      "a fully-retracted gram still scores as seen")

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
