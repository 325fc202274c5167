package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Quality

/** observe()-based QC metrics: accumulated during the pipeline's own
  * pass, checked with declarative expectations.
  */
class QualitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("observed metrics ride along a real pipeline pass") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("maybe_null", when(col("doc_id") % 10 === 0, lit(null)).otherwise(col("lang")))
    val (instrumented, obs) = Quality.observed(docs, "docs_qc", "doc_id", Seq("maybe_null", "text"))
    // the pipeline does its normal work; metrics accumulate for free
    val n = instrumented.filter(length(col("text")) > 0).count()
    val m = obs.get
    assert(m("rows") === 500L)
    assert(m("key_nonnull") === 500L)
    assert(m("nulls_maybe_null") === 50L)
    assert(m("nulls_text") === 0L)
    assert(n === 500L)
    // declarative gate
    val violations = Quality.expect(m)(
      ("rows", v => v.asInstanceOf[Long] > 0, "empty input"),
      ("nulls_text", v => v.asInstanceOf[Long] == 0, "null documents"),
      ("nulls_maybe_null", v => v.asInstanceOf[Long] == 0, "nulls in maybe_null"))
    assert(violations === Seq("nulls in maybe_null (got 50)"))
  }
}
