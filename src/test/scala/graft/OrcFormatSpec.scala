package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ORC materialization twin's contract: the parquet and ORC
  * exports of the SAME funnel survivors must carry identical content
  * (row count + order-independent row digest over every column), the
  * ORC layout must be lang-partitioned like the parquet one, and a
  * lang-filtered read must prune to the matching partition dirs (the
  * storage-format property a format switch must not lose).
  */
class OrcFormatSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("ORC export == parquet export content; lang partition pruning holds") {
    val d = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val nP = graft.queries.PipelineQueries.materialize(spark, d, dir)
    graft.queries.releasePersisted(); spark.catalog.clearCache()
    val nO = graft.queries.PipelineQueries.materializeOrc(spark, d, dir)
    graft.queries.releasePersisted(); spark.catalog.clearCache()
    assert(nP === nO)
    assert(nP > 0)
    def digest(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(coalesce(sum(hash(
        col("doc_id"), col("source"), col("lang"), col("text")).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    val pq = spark.read.parquet(s"$dir/corpus")
    val orc = spark.read.orc(s"$dir/corpus_orc")
    assert(digest(pq) === digest(orc))
    // same partitioned layout on disk
    def langDirs(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("lang="))
        .map(_.getName).toSet
    assert(langDirs("corpus_orc") === langDirs("corpus"))
    assert(langDirs("corpus_orc").nonEmpty)
    // a lang filter prunes the ORC scan to that partition's rows
    val lang = langDirs("corpus_orc").head.stripPrefix("lang=")
    val filtered = orc.filter(col("lang") === lang)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("Scan orc"), plan)
    val expected = pq.filter(col("lang") === lang).count()
    assert(filtered.count() === expected)
  }
}
