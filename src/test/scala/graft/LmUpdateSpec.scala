package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q170 (LM-state update under re-crawl). The
  * corpus exercises count folds, flag flips (48/100 at sf0.01), and
  * vocabulary BIRTH (truncation cuts mid-word: 31 → 63 words), but no
  * word ever DIES there — the cw→0 half of the counted-bag law is
  * pinned here on synthetic trigram frames through the same
  * [[graft.queries.PipelineQueries.lmUpdateOver]] plan, against an
  * independent from-scratch retrain over survivors ∪ re-crawled grams
  * (direct recounts — a different code path than the fold), so
  * subtract+add ≡ retrain is asserted with death AND birth in one wave.
  */
class LmUpdateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("one wave kills a word and births another; fold ≡ from-scratch retrain") {
    import spark.implicits._
    // doc 1 is the ONLY holder of "zzz"; its re-crawl drops zzz and
    // introduces the brand-new word "nnn"
    val train = Seq(
      (1L, "a b", "zzz"), (1L, "b zzz", "zzz"),
      (2L, "a b", "c"), (2L, "b c", "a"),
      (3L, "a b", "c"), (3L, "b c", "b"))
      .toDF("doc_id", "ctx", "w")
    val deadOld = train.filter(col("doc_id") === 1L)
    val addNew = Seq((1L, "a b", "nnn"), (1L, "b nnn", "c"))
      .toDF("doc_id", "ctx", "w")
    // the probe hits a surviving gram, a retracted-to-unseen gram
    // (dead word), and a born gram (new word)
    val probe = Seq(
      (10L, "a b", "c"), (10L, "a b", "zzz"), (10L, "a b", "nnn"))
      .toDF("doc_id", "ctx", "w")

    val got = graft.queries.PipelineQueries
      .lmUpdateOver(train, deadOld, addNew, probe)
      .collect().toSeq

    // |V_live|: {zzz, c, a, b} − zzz + nnn → 4
    assert(got.forall(_.getAs[Long]("v_live") == 4L),
      "the counted vocabulary did not retract the dying word / admit the born one")

    // fold ≡ retrain: recount survivors ∪ re-crawled grams directly
    val live = train.filter(col("doc_id") =!= 1L).unionByName(addNew)
    val want = graft.queries.PipelineQueries.lmScoreOver(probe,
        live.groupBy(col("ctx"), col("w")).agg(count(lit(1)).as("cb")),
        live.groupBy(col("ctx")).agg(count(lit(1)).as("cu")),
        live.select(col("w")).distinct().count())
      .withColumn("v_live", lit(4L))
      .orderBy(col("doc_id"))
      .collect().toSeq
    assert(got === want, "update fold diverged from the from-scratch retrain")

    // exactly the dead word's gram scores as unseen; the born word's
    // gram is seen through the added counts
    assert(got.head.getAs[Long]("n_unseen") === 1L,
      "dead-word gram not unseen, or born-word gram not seen")

    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
