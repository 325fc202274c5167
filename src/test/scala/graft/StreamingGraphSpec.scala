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
}
