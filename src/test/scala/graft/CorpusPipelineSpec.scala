package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.PipelineQueries

/** End-to-end corpus materialization (q57 + PipelineQueries.materialize):
  * funnel monotonicity, stage counts consistent with the individually-
  * proven stage queries, and the written partition layout.
  */
class CorpusPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("funnel counts are monotone and each stage drops what its stage query says") {
    val funnel = SparkEntry.queries("q57_corpus_funnel")(spark, d)
    funnel.persist()
    val t = funnel.agg(
      sum(col("n_total")), sum(col("n_dedup")), sum(col("n_quality")),
      sum(col("n_decontam")), sum(col("n_sample"))).first()
    val Seq(nTotal, nDedup, nQuality, nDecontam, nSample) =
      (0 until 5).map(t.getLong)
    assert(nTotal >= nDedup && nDedup >= nQuality &&
      nQuality >= nDecontam && nDecontam >= nSample, s"funnel not monotone: $t")
    assert(nSample > 0, "pipeline shipped an empty corpus")
    // dedup stage agrees with q56's keeper count
    val keepers = SparkEntry.queries("q56_dup_groups")(spark, d)
      .filter(col("keeper") === 1).count()
    assert(nDedup == keepers, s"funnel n_dedup $nDedup != q56 keepers $keepers")
    assert(nTotal == spark.read.parquet(s"$d/documents.parquet").count())
    funnel.unpersist()
    queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("materialize writes the lang-partitioned survivors and nothing else") {
    val out = s"/tmp/graft_corpus_${System.nanoTime()}"
    val shipped = PipelineQueries.materialize(spark, d, out)
    val funnelSample = SparkEntry.queries("q57_corpus_funnel")(spark, d)
      .agg(sum(col("n_sample"))).first().getLong(0)
    assert(shipped == funnelSample,
      s"written rows $shipped != funnel n_sample $funnelSample")
    // partition layout: lang=<value> directories, readable back with the
    // partition column recovered
    val dirs = new java.io.File(s"$out/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")),
      s"unexpected partition layout: ${dirs.mkString(",")}")
    val back = spark.read.parquet(s"$out/corpus")
    assert(back.columns.contains("lang"))
    assert(back.select(col("doc_id")).distinct().count() == shipped,
      "doc_id not unique in the shipped corpus")
    // shipped docs all pass every stage predicate: re-derive flags
    val flagged = back.select(col("doc_id"))
      .join(SparkEntry.queries("q56_dup_groups")(spark, d), Seq("doc_id"))
    assert(flagged.filter(col("keeper") =!= 1).count() == 0,
      "a non-keeper doc was shipped")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    queries.releasePersisted()
    spark.catalog.clearCache()
  }

  test("q75 quotas hit the epoch budget exactly and follow the temperature") {
    import spark.implicits._
    val out = SparkEntry.queries("q75_mixture_weights")(spark, d)
      .as[(String, Long, Double, Long)].collect().toSeq
    queries.releasePersisted()
    assert(out.nonEmpty)
    // largest-remainder apportionment: the integer quotas sum to the
    // budget EXACTLY, no source is left at zero, and each is within 1
    // token of its real-valued share
    assert(out.map(_._4).sum == PipelineQueries.EpochBudget)
    assert(out.forall(_._4 > 0))
    assert(out.forall { case (_, _, w, q) =>
      math.abs(q - w * PipelineQueries.EpochBudget) <= 1.0 })
    // α = 0.5 temperature: weights order like token mass but flatter —
    // the biggest source is under-weighted vs its mass share
    val mass = out.map(_._2).sum.toDouble
    val big = out.maxBy(_._2)
    assert(big._3 < big._2 / mass,
      "temperature did not flatten the largest source")
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-9)
    spark.catalog.clearCache()
  }

  test("materializeShuffled shard files replay q71's training order exactly") {
    import spark.implicits._
    val out = s"/tmp/graft_shuf_${System.nanoTime()}"
    val shipped = PipelineQueries.materializeShuffled(spark, d, out)
    queries.releasePersisted()
    val expected = SparkEntry.queries("q71_corpus_shuffle")(spark, d)
      .select(col("shard"), col("pos"), col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    queries.releasePersisted()
    assert(shipped == expected.size.toLong)
    // shard dirs exist and, read file-by-file in shard order, the row
    // order on disk IS the (shard, pos) training order — a plain
    // sequential reader needs no sort to replay it
    val dirs = new java.io.File(s"$out/shuffled").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("shard=")))
    val replayed = dirs.flatMap { sd =>
      val shard = sd.stripPrefix("shard=").toLong
      spark.read.parquet(s"$out/shuffled/$sd")
        .select(col("pos"), col("doc_id"))
        .as[(Long, Long)].collect() // parquet scan preserves row-group order per file
        .map { case (pos, id) => (shard, pos, id) }
    }.toSeq
    assert(replayed == expected, "on-disk order diverges from q71's training order")
    // same seed ⇒ same order on a different partitioning of the input
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    spark.catalog.clearCache()
  }
}
