package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for q114 (dedup-corrected effective size): the
  * per-source weighted fold recomputed in Scala from q56's OWN cluster
  * assignment (same detector, different grain — a drift between the
  * two consumers of the label table surfaces here) joined to raw token
  * counts, plus the binding facts: every source's ratio is < 1 on this
  * corpus (measured — no dup-free source exists), ratios genuinely
  * vary, and singleton docs exercise the csz = 1 path inside sources.
  */
class DedupWeightSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q114 equals the per-doc weighted fold over q56's clusters; weighting binds") {
    val out = SparkEntry.queries("q114_effective_size")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val clusters = SparkEntry.queries("q56_dup_groups")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> cluster_size
    queries.releasePersisted()
    spark.catalog.clearCache()

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    val expect = docs.groupBy(_._2).toSeq.map { case (src, xs) =>
      val raw = xs.map(_._3).sum
      val eff = xs.map(x => x._3 * 1000000L / clusters(x._1)).sum
      (src, xs.size.toLong, xs.count(x => clusters(x._1) > 1).toLong, raw, eff,
        eff.toDouble / 1e6 / raw)
    }.sortBy(_._1)

    assert(out.toSeq == expect, "q114 diverges from the q56-cluster weighted fold")
    assert(out.forall(_._6 < 1.0), "a dup-free source appeared — update the measured claim")
    assert(out.map(_._6).distinct.length > 1, "ratios do not vary across sources")
    // the csz = 1 path is exercised inside sources, not just across them
    assert(docs.exists(x => clusters(x._1) == 1L), "no singleton doc — weighting degenerate")
  }
}
