package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guards for q76 (semantic dedup) and q77 (TF-IDF top-k)
  * beyond the DuckDB oracle: q76's verdicts are checked against a
  * brute-force all-pairs sweep (completeness within cells, soundness of
  * every flag), q77's integer-idf scores against an independent
  * driver-side recomputation.
  */
class SemanticTfidfSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("q76 flags exactly the vectors with a ≥θ smaller-id cellmate (vs brute force)") {
    import graft.functions.DotFold
    val out = SparkEntry.queries("q76_semantic_dedup")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    assert(out.length == 500, "one row per vector")
    val cellOf = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dups = out.filter(_.getInt(4) == 1).map(_.getLong(0)).toSet
    assert(dups.nonEmpty, "threshold chosen non-vacuously — corpus has within-cell dups")

    // brute-force ALL cos ≥ θ pairs (500 vecs — fine at spec scale),
    // same DotFold accumulation as the query
    val emb = graft.ops.Ivf.prep(
      spark.read.parquet(s"$d/embeddings.parquet"))
    val pairs = emb.select(col("vec_id").as("va"), col("v").as("xa"), col("nrm").as("na"))
      .join(emb.select(col("vec_id").as("vb"), col("v").as("xb"), col("nrm").as("nb")),
        col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (DotFold(col("xa"), col("xb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= graft.queries.TextQueries.SemDupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    // completeness: every ≥θ pair that lands in one cell flags the larger id
    for ((va, vb, cos) <- pairs if cellOf(va) == cellOf(vb))
      assert(dups.contains(vb), s"within-cell pair ($va,$vb,cos=$cos) not flagged")
    // soundness: every flagged vector has some ≥θ smaller-id cellmate
    val bruteDup = pairs.filter { case (va, vb, _) => cellOf(va) == cellOf(vb) }
      .map(_._2).toSet
    assert(dups == bruteDup, "flag set diverges from the brute-force sweep")
    // nn rows are internally consistent: smaller id, ≥θ cos on dups
    for (r <- out if r.getInt(4) == 1) {
      assert(r.getLong(2) < r.getLong(0), "kept representative must be the smaller id")
      assert(r.getDouble(3) >= graft.queries.TextQueries.SemDupThreshold)
    }
  }

  test("q77 scores equal the integer-idf recomputation and rank correctly per doc") {
    val out = SparkEntry.queries("q77_tfidf_topk")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(out.nonEmpty)
    for (r <- out) {
      val (tf, df, score) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(df >= 1 && df <= nDocs)
      assert(score == tf * ((1000000L * nDocs) / df),
        s"score must be tf·((10⁶·N) div df) for ${r.getString(2)}")
    }
    // per doc: ranks are 1..k, scores non-increasing, term ties impossible
    for ((_, rows) <- out.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.length <= graft.queries.TextQueries.TfidfTopK)
      for (Array(hi, lo) <- sorted.sliding(2).map(_.toArray) if sorted.length > 1)
        assert(hi.getLong(5) > lo.getLong(5) ||
          (hi.getLong(5) == lo.getLong(5) && hi.getString(2) < lo.getString(2)))
    }
  }
}
