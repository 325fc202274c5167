package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingCorpus, StreamingDedup, StreamingGraph, StreamingIndex, StreamingLabels, StreamingLm}

/** The COMPOSED rolling pipeline, driven as one system (each component
  * has its own spec; this is the loop a serving deployment actually
  * runs): documents arrive in three waves through ONE arrival stream
  * consumed by BOTH the corpus ingest (admit/gate/sample → parquet) and
  * the dedup chain (verified pairs → partitioned label table), while
  * the vector index appends each wave's embeddings through the frozen
  * quantizers; the stream RESTARTS mid-run (both queries stopped after
  * wave 2 and relaunched from their checkpoints). End state must
  * satisfy the cross-component invariants no per-component spec can
  * see:
  *
  *  - rolling labels ≡ the batch q56 components of the full pair graph;
  *  - written corpus ≡ the sequential greedy admit model ∩ gates
  *    ([[OnlineModels]] — the same formulation StreamingCorpusSpec
  *    uses);
  *  - ADMITTED ∩ DUP: no verified near-dup pair has both endpoints in
  *    the corpus — the dedup chain and the admit chain run separate
  *    band-bucket state, and this is the consistency promise between
  *    them;
  *  - index search ≡ batch q92 bit-for-bit, then search-after-delete:
  *    a tombstoned result vanishes, survivors keep their relative
  *    order (the promotion law), and a policy-driven compaction
  *    (maybeCompact) preserves the post-delete results exactly;
  *  - GRAPH index (round 12): per-wave attach COMPOSES to the batch
  *    attach — three sub-wave appends serve bit-for-bit the q151 rows
  *    (each new node beams the frozen old graph only, so attach is
  *    per-node independent and wave-decomposable), and the delete +
  *    policy-compaction tail serves bit-for-bit the q154 rows.
  */
class RollingPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("three waves + mid-stream restart: labels, corpus, cross-invariant, index lifecycle") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = Files.createTempDirectory("roll_corpus").toString
      val corpusCkpt = Files.createTempDirectory("roll_corpus_ckpt").toString
      val labelDir = Files.createTempDirectory("roll_labels").toString
      val lblCkpt = Files.createTempDirectory("roll_labels_ckpt").toString
      val idxDir = Files.createTempDirectory("roll_index").toString

      val docs = OnlineModels.corpus(spark, d)
      val waves = docs.grouped((docs.length + 2) / 3).toSeq

      val gIdxDir = Files.createTempDirectory("roll_gindex").toString
      // the index's frozen generation + the wave-aligned vector chunks
      val cut = StreamingIndex.buildFrozen(spark, d, idxDir)
      StreamingGraph.buildFrozen(spark, d, gIdxDir)
      val newVecs = spark.read.parquet(s"$d/embeddings.parquet")
        .filter(col("vec_id") >= cut).select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq.sortBy(_._1)
      val vecWaves = newVecs.grouped((newVecs.length + 2) / 3).toSeq

      implicit val sqlCtx = spark.sqlContext
      val source = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String)]
      val stream = source.toDS().toDF("doc_id", "source", "lang", "text")
      def startCorpus() = StreamingCorpus.ingest(stream, out, corpusCkpt)
      def startLabels() = StreamingLabels.start(
        StreamingDedup.pairs(stream.select(col("doc_id"), col("text"))).toDF(),
        labelDir, lblCkpt)

      val lmDir = Files.createTempDirectory("roll_lm").toString
      // phase 1: waves 0 and 1 through both consumers + index appends +
      // the LM gate state (round-14: the fifth maintained store rides
      // the same composed waves)
      var qC = startCorpus()
      var qL = startLabels()
      for (i <- 0 to 1) {
        source.addData(waves(i): _*)
        qC.processAllAvailable(); qL.processAllAvailable()
        StreamingIndex.appendBatch(idxDir)(
          vecWaves(i).toDF("vec_id", "embedding"), i.toLong)
        StreamingGraph.appendBatch(d, gIdxDir)(
          vecWaves(i).toDF("vec_id", "embedding"), i.toLong)
        StreamingLm.updateBatch(lmDir)(
          waves(i).map(w => (w._1, w._4)).toDF("doc_id", "text"), i.toLong)
      }
      // mid-stream restart: both queries stop and relaunch from their
      // checkpoints before the final wave
      qC.stop(); qL.stop()
      qC = startCorpus()
      qL = startLabels()
      try {
        source.addData(waves(2): _*)
        qC.processAllAvailable(); qL.processAllAvailable()
      } finally { qC.stop(); qL.stop() }
      StreamingIndex.appendBatch(idxDir)(
        vecWaves(2).toDF("vec_id", "embedding"), 2L)
      StreamingGraph.appendBatch(d, gIdxDir)(
        vecWaves(2).toDF("vec_id", "embedding"), 2L)
      StreamingLm.updateBatch(lmDir)(
        waves(2).map(w => (w._1, w._4)).toDF("doc_id", "text"), 2L)

      // ---- LM gate state: three composed waves fold to the batch
      // retrain over the whole arrival stream (the LM is an ARRIVALS
      // model — re-crawls/takedowns below add observations, never
      // retract; q156's additive fold law) ----
      val lmProbe = waves(2).map(w => (w._1, w._4)).toDF("doc_id", "text")
      val gotLm = StreamingLm.score(spark, lmDir, lmProbe).collect().toSeq
      val allDocs = docs.map(w => (w._1, w._4)).toDF("doc_id", "text").persist()
      val triAll = graft.queries.PipelineQueries.lmTrigrams(allDocs).persist()
      val wantLm = graft.queries.PipelineQueries.lmScoreOver(
          graft.queries.PipelineQueries.lmTrigrams(lmProbe),
          triAll.groupBy(col("ctx"), col("w")).agg(count(lit(1)).as("cb")),
          triAll.groupBy(col("ctx")).agg(count(lit(1)).as("cu")),
          triAll.select(col("w")).distinct().count())
        .orderBy(col("doc_id")).collect().toSeq
      triAll.unpersist(false); allDocs.unpersist(false)
      assert(gotLm === wantLm,
        "LM state folded through the composed waves diverged from the batch retrain")

      // ---- labels ≡ batch components ----
      val gotLabels = StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantLabels = graft.ops.Dedup.fromPairs(
          graft.queries.TextQueries.dupPairs(spark, d))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLabels.nonEmpty && gotLabels == wantLabels,
        "rolling labels diverge from the batch components after restart")

      // ---- corpus ≡ greedy model ∩ gates ----
      val gotIds = spark.read.parquet(s"$out/corpus")
        .select(col("doc_id")).as[Long].collect().toSet
      val expected = OnlineModels.expectedIds(spark, d,
        OnlineModels.greedyAdmitted(docs))
      assert(gotIds === expected,
        s"only-streamed=${(gotIds -- expected).take(5)} only-model=${(expected -- gotIds).take(5)}")

      // ---- cross-component: admitted ∩ dup components ----
      // every verified pair was witnessed by the admit state in the same
      // arrival order, so its later endpoint must have been rejected —
      // the corpus may hold at most one side of any pair
      val livePairs = StreamingLabels.livePairs(spark, labelDir)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(livePairs.nonEmpty, "no verified pair crossed the pipeline — vacuous run")
      val bothIn = livePairs.filter { case (a, b) => gotIds(a) && gotIds(b) }
      assert(bothIn.isEmpty,
        s"near-dup pair fully admitted: ${bothIn.take(5).toSeq}")

      // ---- index: search ≡ batch q92, then the delete/compact tail ----
      val streamed = StreamingIndex.searchTopK(spark, d, idxDir).collect().toSeq
      val batch = SparkEntry.queries("q92_index_append")(spark, d).collect().toSeq
      assert(streamed === batch, "composed index search diverged from batch q92")
      assert(streamed.exists(_.getAs[Boolean]("is_new")))

      val pre20 = StreamingIndex.searchTopK(spark, d, idxDir, k = 20).collect()
      val delNew = pre20.map(_.getAs[Long]("vec_id")).find(_ >= cut).get
      StreamingIndex.deleteBatch(idxDir)(Seq(delNew).toDF("vec_id"), 0L)
      // 4 generation dirs on disk (gen=-1 + three appends) → the
      // generation-count policy fires and compacts through the same
      // call a serving loop makes
      assert(StreamingIndex.maybeCompact(spark, idxDir, maxGens = 2),
        "policy compaction declined a fragmented index")
      assert(!new java.io.File(s"$idxDir/tombs").exists())
      val post = StreamingIndex.searchTopK(spark, d, idxDir).collect()
      assert(post.forall(_.getAs[Long]("vec_id") != delNew),
        "deleted vector served after compaction")
      val expect = pre20.groupBy(_.getAs[Long]("query_id")).view.mapValues(
        _.sortBy(_.getAs[Int]("rank"))
          .filterNot(_.getAs[Long]("vec_id") == delNew)
          .take(5).map(_.getAs[Long]("vec_id")).toSeq).toMap
      val got = post.groupBy(_.getAs[Long]("query_id")).view.mapValues(
        _.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq).toMap
      assert(got === expect, "survivor order broke across delete+compact")

      // ---- graph index: wave-decomposed attach ≡ batch q151, then the
      // delete + policy-compaction tail ≡ batch q154, bit-for-bit ----
      def gRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getBoolean(3), r.getDouble(4), r.getInt(5))).toSeq
      val gServed = gRows(StreamingGraph.search(spark, d, gIdxDir))
      val gBatch = gRows(SparkEntry.queries("q151_graph_append")(spark, d))
      assert(gServed === gBatch,
        "three sub-wave attaches diverged from the one-batch q151 attach")
      val gDead = spark.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id")).filter(
          pmod(col("vec_id") * lit(1103515245L) + lit(12345L), lit(2147483647L)) <
            lit(graft.queries.TextQueries.DeleteBound))
      StreamingGraph.deleteBatch(gIdxDir)(gDead, 3L)
      // 4 edge generation dirs → the generation-count policy fires
      assert(StreamingGraph.maybeCompact(spark, d, gIdxDir, maxGens = 2),
        "graph policy compaction declined a fragmented index")
      val gPost = gRows(StreamingGraph.search(spark, d, gIdxDir))
      val g154 = gRows(SparkEntry.queries("q154_graph_lifecycle")(spark, d))
      assert(gPost === g154,
        "composed graph delete+compact diverged from batch q154")

      // ---- re-crawl wave (round 13): an UPDATE flows through the
      // label service. The streaming band state cannot retract old
      // content (it would need the old text), so the update wave's
      // pairs are re-derived as a batch probe over the updated corpus —
      // q157's derivation — and folded with updateBatch. The service
      // must land on the batch recompute over the UPDATED corpus.
      val updIds = livePairs.flatMap(p => Seq(p._1, p._2)).distinct
        .sorted.take(3)
      assert(updIds.nonEmpty, "no labeled doc to update — vacuous tail")
      val docsU = graft.Tables.documents(spark, d).select(col("doc_id"),
        when(col("doc_id").isin(updIds: _*), upper(col("text")))
          .otherwise(col("text")).as("text"))
      val updPairsU = graft.queries.TextQueries.simhash64PairsOf(docsU)
        .select(col("da"), col("db")).persist()
      val wavePairs = updPairsU
        .filter(col("da").isin(updIds: _*) || col("db").isin(updIds: _*))
      StreamingLabels.updateBatch(labelDir)(
        updIds.toSeq.toDF("id"), wavePairs, 100L)
      val gotUpd = StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantUpd = graft.ops.Dedup.fromPairs(updPairsU)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotUpd == wantUpd,
        "re-crawl wave through the service diverged from the batch recompute over the updated corpus")
      assert(gotUpd != wantLabels,
        "update wave changed nothing — vacuous re-crawl")
      updPairsU.unpersist(false)

      // ---- the corpus side of the re-crawl, coherently: a re-crawl
      // whose new content DUPLICATES an existing corpus doc flows
      // through BOTH tables — the corpus serves the new text, the label
      // service verifies the new near-dup pair, the admitted∩dup
      // invariant is now violated BY CONSTRUCTION and the violation is
      // detectable from exactly the state the system holds, and a
      // takedown wave restores it.
      val corpusIds = gotIds.toSeq.sorted.filterNot(updIds.contains)
      val (ca, cb) = (corpusIds(0), corpusIds(1))
      val donorText = docs.find(_._1 == cb).get._4
      val caRow = docs.find(_._1 == ca).get
      StreamingCorpus.updateBatch(out)(
        Seq((ca, caRow._2, caRow._3, donorText)).toDF(
          "doc_id", "source", "lang", "text"), 200L)
      val live2 = StreamingCorpus.liveCorpus(spark, out).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(live2(ca) === donorText, "corpus re-crawl did not serve the new text")
      // the label service sees the same universe: wave-100 transforms
      // plus ca carrying cb's text — its new pairs must include (ca, cb)
      val docsU2 = docsU.select(col("doc_id"),
        when(col("doc_id") === ca, donorText).otherwise(col("text")).as("text"))
      val wavePairs2 = graft.queries.TextQueries.simhash64PairsOf(docsU2)
        .select(col("da"), col("db"))
        .filter(col("da") === ca || col("db") === ca)
      StreamingLabels.updateBatch(labelDir)(Seq(ca).toDF("id"), wavePairs2, 101L)
      val pairsNow = StreamingLabels.livePairs(spark, labelDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsNow.contains((math.min(ca, cb), math.max(ca, cb))),
        "the duplicate-introducing re-crawl produced no verified pair")
      // service invariant after any wave mix: labels ≡ CC of the live log
      val lblNow = StreamingLabels.labels(spark, labelDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ccNow = graft.ops.Dedup.fromPairs(
          pairsNow.toSeq.toDF("da", "db"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lblNow == ccNow, "labels diverged from the live pair log's components")
      // detect the violation from held state, resolve by takedown
      val liveIds2 = live2.keySet
      val violations = pairsNow.filter(p => liveIds2(p._1) && liveIds2(p._2))
      assert(violations.nonEmpty, "duplicate admission not detectable — vacuous")
      StreamingCorpus.deleteBatch(out)(Seq(ca).toDF("doc_id"), 201L)
      val live3 = StreamingCorpus.liveCorpus(spark, out).collect()
        .map(_.getLong(0)).toSet
      assert(pairsNow.forall(p => !(live3(p._1) && live3(p._2))),
        "takedown did not restore the admitted-dup invariant")

      for (dir <- Seq(out, corpusCkpt, labelDir, lblCkpt, idxDir, gIdxDir, lmDir))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
