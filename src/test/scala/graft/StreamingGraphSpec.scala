package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph-ANN SERVING loop ([[graft.streaming.StreamingGraph]]) —
  * the StreamingIndex parity test for the NSW family. The service is
  * only plumbing over the oracled operators, and this spec pins that
  * claim bit-for-bit at every lifecycle stage:
  *  - frozen build + attach wave  → search ≡ batch q151 rows exactly
  *  - tombstone wave (lazy)       → live-only serving, unrepaired
  *  - compact (= the q154 repair) → search ≡ batch q154 rows exactly
  * plus idempotent wave replay, the compaction policy's both branches,
  * and tombstone teardown after the certified rewrite.
  */
class StreamingGraphSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getBoolean(3), r.getDouble(4), r.getInt(5))).toSeq

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"serve ≡ q151 after attach, live-only after delete, ≡ q154 after compact ($d)") {
      import graft.streaming.StreamingGraph
      val dir = s"/tmp/graft_sgraph_${ProcessHandle.current().pid()}_${d.split('/').last}"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)

      val cut = StreamingGraph.buildFrozen(spark, d, dir)
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      StreamingGraph.appendBatch(d, dir)(emb.filter(col("vec_id") >= cut), 0L)
      // idempotent replay: the marker short-circuits, the edge set holds
      val edgesBefore = StreamingGraph.liveEdges(spark, dir).count()
      StreamingGraph.appendBatch(d, dir)(emb.filter(col("vec_id") >= cut), 0L)
      assert(StreamingGraph.liveEdges(spark, dir).count() === edgesBefore)

      val servedAppend = rows(StreamingGraph.search(spark, d, dir))
      val q151 = rows(SparkEntry.queries("q151_graph_append")(spark, d))
      assert(servedAppend === q151, "post-attach serve drifted from batch q151")

      // tombstone wave: the q152/q154 seeded slice over ALL ids
      val dead = emb.select(col("vec_id")).filter(
        pmod(col("vec_id") * lit(1103515245L) + lit(12345L), lit(2147483647L)) <
          lit(graft.queries.TextQueries.DeleteBound))
      StreamingGraph.deleteBatch(dir)(dead, 1L)
      val deadSet = dead.collect().map(_.getLong(0)).toSet
      val servedDeleted = rows(StreamingGraph.search(spark, d, dir))
      assert(!servedDeleted.exists(r => deadSet(r._3)),
        "a tombstoned vector was served pre-compact")

      // policy: ~12.8% tombstoned — under the default 25% bar, over a 10% one
      assert(!StreamingGraph.compactionDue(spark, dir))
      assert(StreamingGraph.compactionDue(spark, dir, maxTombRatio = 0.10))
      assert(StreamingGraph.maybeCompact(spark, d, dir, maxTombRatio = 0.10))

      val servedCompacted = rows(StreamingGraph.search(spark, d, dir))
      val q154 = rows(SparkEntry.queries("q154_graph_lifecycle")(spark, d))
      assert(servedCompacted === q154, "post-compact serve drifted from batch q154")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombs")),
        "tombstones survived the certified compaction")
      // the edge table collapsed back to one generation
      val gens = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/edges"))
        .count(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      assert(gens === 1)

      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.queries.releasePersisted()
      spark.catalog.clearCache()
    }
  }

  test("torn edge generations are invisible; folded delete waves don't kill re-admitted ids") {
    import spark.implicits._
    import graft.streaming.StreamingGraph
    val d = "/root/testdata/sf0.001"
    val dir = s"/tmp/graft_sgraph_torn_${ProcessHandle.current().pid()}"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)

    val cut = StreamingGraph.buildFrozen(spark, d, dir)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    StreamingGraph.appendBatch(d, dir)(emb.filter(col("vec_id") >= cut), 0L)
    val edges0 = StreamingGraph.liveEdges(spark, dir).count()
    val served0 = rows(StreamingGraph.search(spark, d, dir))

    // ---- TORN WAVE: a marker-less crash leftover duplicating existing
    // edge rows (the payload a raw fold would permanently double)
    val dup = StreamingGraph.liveEdges(spark, dir).limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    dup.toDF("src", "dst").write.mode("overwrite").parquet(s"$dir/edges/gen=77")
    assert(new java.io.File(s"$dir/edges/gen=77/_SUCCESS").delete())
    spark.catalog.refreshByPath(s"$dir/edges")
    assert(StreamingGraph.liveEdges(spark, dir).count() === edges0,
      "a torn edge generation's partial rows are visible to serving")
    StreamingGraph.compact(spark, d, dir) // must NOT fold the torn partials
    assert(!new java.io.File(s"$dir/edges/gen=77").exists(),
      "the swap must discard the torn leftover (its wave replays in full)")
    assert(rows(StreamingGraph.search(spark, d, dir)) === served0,
      "torn-wave partials folded by graph compaction")

    // ---- folded DELETE wave replay vs a re-admitted vec_id (the
    // _HORIZON_DELETE guard, round-15)
    val victim = served0.map(_._3).filter(_ >= cut).head
    StreamingGraph.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 0L)
    StreamingGraph.compact(spark, d, dir) // folds the tombstone; _HORIZON_DELETE = 0
    StreamingGraph.appendBatch(d, dir)(
      emb.filter(col("vec_id") === victim), 1L) // re-admit
    assert(StreamingGraph.liveMembers(spark, dir).filter(col("vec_id") === victim)
        .count() === 1, "re-admitted id not a member — the branch is dormant")
    StreamingGraph.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 0L) // the replay
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombs")),
      "a folded delete wave's replay re-landed past the horizon guard")
    assert(StreamingGraph.liveMembers(spark, dir).filter(col("vec_id") === victim)
      .count() === 1)
    StreamingGraph.deleteBatch(dir)(Seq(victim).toDF("vec_id"), 1L) // genuinely new
    assert(StreamingGraph.liveMembers(spark, dir).filter(col("vec_id") === victim)
        .count() === 0, "the delete-horizon guard over-blocks new delete waves")

    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    graft.queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
