package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live non-vacuity guards for q155 (held-out LM filter) — the
  * measure-don't-pin discipline: the gate must FLAG a strict subset
  * (neither nobody nor everybody — a threshold outside the score
  * spread would silently pass the oracle while filtering nothing),
  * the unseen-n-gram branch must actually fire (it is the reason a
  * held-out filter exists), and every wave doc must be scored.
  */
class SurprisalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"held-out surprisal filter: strict-subset flag, live unseen branch ($d)") {
      val out = SparkEntry.queries("q155_surprisal_filter")(spark, d)
        .agg(count(lit(1)).as("n"), sum(col("flagged")).as("nf"),
          sum(col("n_unseen")).as("nu"))
        .collect()(0)
      val (n, nf, nu) = (out.getLong(0), out.getLong(1), out.getLong(2))
      val total = Tables.documents(spark, d).count()
      val waveDocs = total - total * 4 / 5
      assert(n === waveDocs, s"scored $n docs, wave holds $waveDocs")
      assert(nf > 0 && nf < n,
        s"flag not a strict subset ($nf of $n) — threshold outside the score spread")
      assert(nu > 0, "no unseen n-gram crossed the held-out boundary — smoothing untested")
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
  }
}
