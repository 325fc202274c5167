package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DotFold

/** Retrieval quality of the trained-IVF ANN (q42): recall@5 against the
  * exact brute-force top-5 (the q29 scoring, unrestricted). A 2-probe
  * scan of 16 trained cells reads ~1/8 of the corpus per query, so
  * recall well above 1/8 demonstrates the inverted file concentrates
  * true neighbors — the training must be doing real work.
  */
class IvfRecallSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("trained IVF recall@5 vs brute-force cosine top-5") {
    val d = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        sqrt(DotFold(col("embedding"), col("embedding"))).as("nrm"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    val brute = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", DotFold(col("qv"), col("embedding")) / (col("qnrm") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.TextQueries.q42AnnIvf(spark, d)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"recall@5 = $recall%.2f (${ivf.intersect(brute).size}/${brute.size})")
    assert(brute.size == 25)
    // 2/16 cells probed ≈ 12.5% of the corpus scanned; random cells would
    // land recall ≈ 0.125
    assert(recall >= 0.5, f"trained IVF recall@5 too low: $recall%.2f")
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("train-once index: probe-only search matches in-plan q42 bit-for-bit, no training in plan") {
    val d = "/root/testdata/sf0.01"
    val idx = s"/tmp/graft_ivf_${System.nanoTime()}"
    graft.ops.Ivf.buildIndex(spark, d, idx)
    val probeOnly = graft.ops.Ivf.probeTopK(spark, d, idx)
    // the integer centroid state round-trips parquet losslessly, so the
    // probe-only rows — including the double cosines — are IDENTICAL
    val a = probeOnly.collect().map(_.toSeq).toSeq
    val b = graft.queries.TextQueries.q42AnnIvf(spark, d).collect().map(_.toSeq).toSeq
    assert(a == b, "probe-only top-5 differs from in-plan q42")
    // and the probe plan carries no training pass: no typed-aggregator
    // update (ObjectHashAggregate/MapGroups) — q42's in-plan trainer has
    // both — just scans of the persisted index tables
    val plan = probeOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate") && !plan.toLowerCase.contains("mapgroups"),
      "probe-only plan still contains a training aggregation")
    assert(plan.contains("centroids") && plan.contains("assignments"),
      "probe-only plan does not read the persisted index")
    // serving reads ONLY the index: the (v, nrm) payload is stored in the
    // assignments table at build time, so probes never re-scan (or
    // re-prep) the raw embeddings parquet
    assert(!plan.contains("embeddings.parquet"),
      "probe-only plan still scans the raw embeddings parquet")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
