package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Connected-components duplicate-group resolution (q56 / ops.Dedup):
  * the rounds-vs-diameter bound on path graphs, fixpoint detection on
  * the real corpus, and the q56 output contract (partition of the
  * corpus, one keeper per cluster, sizes consistent).
  */
class DedupGroupsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  /** Path graph 0-1-2-…-n (diameter n) as (vertices, edges). */
  private def path(n: Int) = {
    import spark.implicits._
    val verts = (0L to n).toDF("id")
    val edges = (0L until n).map(i => (i, i + 1)).toDF("src", "dst")
    (verts, edges)
  }

  test("monotone chains converge in roundsFor(d) + 1 detection round, and need that many") {
    def cover(r: Int): Long = (1L << (r + 1)) - 2
    for (dia <- Seq(6, 14, 30)) {
      val r = Dedup.roundsFor(dia)
      assert(cover(r) >= dia && (r == 1 || cover(r - 1) < dia),
        s"roundsFor($dia) = $r is not the minimal doubling bound")
      // preCollapse off: this test measures the PURE propagation bound
      val (lbl, rounds) = Dedup.connectedComponentsWithRounds(
        path(dia)._1, path(dia)._2, preCollapse = false)
      assert(lbl.filter(col("lbl") =!= 0L).count() == 0, s"diameter $dia not fully labeled")
      // coverage is exactly 2^(r+1)-2: converged on the nose at r, +1 round to detect
      assert(rounds == r + 1,
        s"diameter $dia took $rounds rounds, expected ${r + 1} (= roundsFor + detection)")
    }
  }

  test("a too-small maxRounds fails loudly instead of returning partial clusters") {
    val (v, e) = path(30)
    assertThrows[IllegalStateException] {
      Dedup.connectedComponentsWithRounds(v, e, maxRounds = 2, preCollapse = false)
    }
  }

  test("union-find pre-collapse: identical labels, fewer rounds than pure propagation") {
    val (v, e) = path(30)
    // 4 partitions → each holds a subchain; local collapse flattens it
    val (lbl, rounds) = Dedup.connectedComponentsWithRounds(v, e.repartition(4))
    assert(lbl.filter(col("lbl") =!= 0L).count() == 0, "pre-collapsed labels diverge")
    val pure = Dedup.roundsFor(30) + 1
    assert(rounds < pure, s"pre-collapse took $rounds rounds, pure propagation $pure")
  }

  test("localCollapse skew guard: a tiny drain cap yields valid seeds and identical components") {
    import spark.implicits._
    // one contiguous dup family (path 0..30) forced through a single range
    // partition with a cap far below its endpoint count — the map drains
    // repeatedly mid-family
    val (v, e) = path(30)
    val seeds = Dedup.localCollapse(e.repartition(1), maxEntries = 4)
      .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      .as[(Long, Long)].collect().toMap
    // every endpoint got a seed, each seed is monotone (lbl <= id) and
    // reachable (a real vertex of the same component — on a path, any
    // smaller id)
    assert(seeds.keySet == (0L to 30L).toSet)
    assert(seeds.forall { case (id, lbl) => lbl <= id && lbl >= 0L })
    // and the full CC result is unchanged by the draining
    val lbl = Dedup.connectedComponentsWithRounds(v, e.repartition(1))._1
    assert(lbl.filter(col("lbl") =!= 0L).count() == 0, "drained seeds broke the fixpoint")
  }

  test("property: labels equal a union-find model on seeded random graphs") {
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(40)
      // sparse to dense-ish: isolated vertices, chains, and merged blobs
      val m = rnd.nextInt(n * 2)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // model: classic union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      for ((a, b) <- edges) parent(find(a.toInt)) = find(b.toInt)
      val minOf = (0 until n).groupBy(find).flatMap { case (_, vs) =>
        val mn = vs.min.toLong; vs.map(v => v.toLong -> mn) }
      val verts = (0L until n).toDF("id")
      val got = Dedup.connectedComponents(verts, edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === minOf, s"seed $seed: CC labels diverge from union-find")
    }
  }

  test("q56 output is a partition: keepers = clusters, sizes consistent, pairs co-clustered") {
    val out = SparkEntry.queries("q56_dup_groups")(spark, d)
    out.persist()
    val n = out.count()
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    assert(n == nDocs, "q56 must emit exactly one row per document")
    // exactly one keeper per cluster, and it is the cluster min
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(col("keeper")).as("nk"), min(col("doc_id")).as("mn"),
        count(lit(1)).as("sz"), max(col("cluster_size")).as("csz"),
        min(col("cluster_size")).as("csz2"))
    assert(perCluster.filter(col("nk") =!= 1).count() == 0, "cluster without exactly one keeper")
    assert(perCluster.filter(col("mn") =!= col("cluster_id")).count() == 0,
      "cluster_id is not the min doc_id of its cluster")
    assert(perCluster.filter(col("sz") =!= col("csz") || col("csz") =!= col("csz2")).count() == 0,
      "cluster_size column inconsistent with actual cluster size")
    // near-dup pairs always land in the same cluster (pair graph ⊆ clusters)
    val pairs = SparkEntry.queries("q51_simhash64")(spark, d)
    val lblOf = out.select(col("doc_id"), col("cluster_id"))
    val both = pairs
      .join(lblOf.withColumnRenamed("doc_id", "da").withColumnRenamed("cluster_id", "ca"), Seq("da"))
      .join(lblOf.withColumnRenamed("doc_id", "db").withColumnRenamed("cluster_id", "cb"), Seq("db"))
    assert(both.filter(col("ca") =!= col("cb")).count() == 0,
      "a verified near-dup pair was split across clusters")
    out.unpersist()
    queries.releasePersisted()
    spark.catalog.clearCache()
  }
}
