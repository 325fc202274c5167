package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Beyond-the-oracle guards for the round-8 operators: q127's
  * quantization contract, q129's superset-of-q39 candidate guarantee,
  * q130's conservation/bound properties, and a STRING-level model for
  * q131 (gram equality is the verdict there, so the spec recomputes
  * coverage from token strings on a fixture where the union of
  * overlapping masks is hand-checkable — the q81/NoveltySpec
  * discipline).
  */
class Round8OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  private def drain(): Unit = {
    queries.releasePersisted(); spark.catalog.clearCache()
  }

  test("q127: SQ8 reconstruction stays within one quantization step; audit recall binds") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val dims = emb.head._2.indices.map { i =>
      val xs = emb.map(_._2(i)); (xs.min.toDouble, xs.max.toDouble)
    }
    // model quantize→dequantize; every reconstructed value within one step
    for ((_, v) <- emb.take(50); (x, i) <- v.zipWithIndex) {
      val (mn, mx) = dims(i)
      val c = if (mx == mn) 0L
        else math.min(math.floor((x.toDouble - mn) * 255.0 / (mx - mn)).toLong, 255L)
      val xh = mn + (c.toDouble * (mx - mn)) / 255.0
      val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
      assert(math.abs(xh - x.toDouble) <= step + 1e-12,
        s"dim $i: reconstruction $xh misses $x beyond one step $step")
    }
    val out = SparkEntry.queries("q127_sq8_ann")(spark, d).collect()
    drain()
    assert(out.length == 50)
    val hits = out.map(_.getAs[Int]("in_exact_topk")).sum
    assert(hits >= 40, s"SQ8 top-10 overlap vs exact dot collapsed: $hits/50")
  }

  test("q129: multi-probe candidates strictly extend q39's and the flag binds") {
    val q39 = SparkEntry.queries("q39_ann_lsh")(spark, d)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    drain()
    val out = SparkEntry.queries("q129_multiprobe_lsh")(spark, d).collect()
    drain()
    val viaProbe = out.map(_.getAs[Int]("via_probe")).sum
    assert(viaProbe > 0, "no top-5 row required a perturbation — multi-probe is vacuous here")
    // superset property at the result level: every q39 top-5 row that
    // survives into q129's top-5 must carry via_probe = 0 — q39's rows
    // came from unperturbed buckets, so q129 can never label them as
    // perturbation-only
    val direct = out.filter(_.getAs[Int]("via_probe") == 0)
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    for (key <- q39 if out.exists(r => (r.getLong(0), r.getLong(2)) == key))
      assert(direct.contains(key),
        s"$key is a q39 (single-probe) result but q129 flags it via_probe")
    // candidate-count expansion: the reported n_cand must exceed the
    // q39 top-5 depth so the cost axis is real
    assert(out.forall(_.getAs[Long]("n_cand") > 5L))
  }

  test("q130: token mass conserves, every shard is filled, snake beats naive spread") {
    val out = SparkEntry.queries("q130_shard_balance")(spark, d).collect()
    drain()
    assert(out.length == graft.queries.PipelineQueries.BalanceShards)
    val total = Tables.documents(spark, d)
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .agg(sum(col("nt"))).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("tokens")).sum == total, "snake masses lose tokens")
    assert(out.map(_.getAs[Long]("tokens_naive")).sum == total, "naive masses lose tokens")
    assert(out.forall(_.getAs[Long]("n_docs") > 0L))
    val snakeSpread = out.map(_.getAs[Long]("tokens")).max - out.map(_.getAs[Long]("tokens")).min
    val naiveSpread = out.map(_.getAs[Long]("tokens_naive")).max - out.map(_.getAs[Long]("tokens_naive")).min
    assert(snakeSpread < naiveSpread,
      s"serpentine spread $snakeSpread not tighter than naive $naiveSpread")
    // serpentine bound: each 2W stripe contributes pairwise-balanced
    // loads, so the spread is bounded by one maximum document
    val maxNt = Tables.documents(spark, d)
      .select(size(split(col("text"), " ")).cast("long").as("nt"))
      .agg(max(col("nt"))).collect()(0).getLong(0)
    assert(snakeSpread <= maxNt, s"snake spread $snakeSpread exceeds one max doc $maxNt")
  }

  test("q131 core equals the string-level mask model on a fixture") {
    // Drive the factored maskBudget core with gram STRINGS (no hashing
    // anywhere — gram equality is the verdict, so this catches the
    // hash-collision wrongness the hash-level oracle can't): two docs
    // share a long verbatim span; a third shares a shorter span below
    // the threshold; a fourth is unrelated. The expected union
    // coverage is recomputed by brute force.
    val span = (1 to 12).map(i => s"dup$i") // 12 shared tokens = 10 grams ≥ MaskMinGrams
    val shortSpan = (1 to 6).map(i => s"sh$i") // 6 tokens = 4 grams < threshold
    def words(p: String, n: Int) = (1 to n).map(i => s"$p$i")
    val docs = Seq(
      0L -> (words("a", 5) ++ span ++ words("b", 5)),
      1L -> (words("c", 3) ++ span ++ words("e", 7)),
      2L -> (words("f", 4) ++ shortSpan ++ words("g", 8)),
      3L -> words("h", 20))
    // brute-force token-level model: for every ordered doc pair,
    // diagonal runs of 3-gram string matches, keep runs ≥ MaskMinGrams,
    // mark covered token positions, union
    val thr = graft.queries.TextQueries.MaskMinGrams
    def grams(t: Seq[String]) = t.sliding(3).map(_.mkString(" ")).toVector
    val expect = docs.map { case (id, t) =>
      val mine = grams(t)
      val covered = scala.collection.mutable.Set.empty[Int]
      for ((oid, ot) <- docs if oid != id) {
        val theirs = grams(ot).zipWithIndex.groupBy(_._1)
        // diagonal runs over matching gram positions
        val matches = for {
          (g, i) <- mine.zipWithIndex
          (_, j) <- theirs.getOrElse(g, Vector.empty)
        } yield (i - j, i)
        for ((_, ps) <- matches.groupBy(_._1)) {
          val sorted = ps.map(_._2).distinct.sorted
          var run = List.empty[Int]
          for (p <- sorted) {
            if (run.nonEmpty && p == run.head + 1) run = p :: run
            else {
              if (run.length >= thr) covered ++= (run.last to run.head + 2)
              run = List(p)
            }
          }
          if (run.length >= thr) covered ++= (run.last to run.head + 2)
        }
      }
      id -> covered.size
    }.toMap
    assert(expect(0L) == 12 && expect(1L) == 12,
      s"fixture model broken: ${expect(0L)}, ${expect(1L)}")
    assert(expect(2L) == 0 && expect(3L) == 0)
    // the query core, fed the same strings
    import spark.implicits._
    val det = (for ((a, _) <- docs; (b, _) <- docs if a < b) yield (a, b))
      .toDF("da", "db")
    val pos = docs.flatMap { case (id, t) =>
      grams(t).zipWithIndex.map { case (g, i) => (id, (i + 1).toLong, g) }
    }.toDF("doc_id", "pos", "h")
    val nt = docs.map { case (id, t) => (id, t.length.toLong) }.toDF("doc_id", "n_tokens")
    val out = graft.queries.TextQueries.maskBudget(det, pos, nt)
      .select(col("doc_id"), col("masked_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    drain()
    assert(out == expect.map { case (k, v) => k -> v.toLong },
      s"core output $out diverges from the string model $expect")
  }

  test("q134: the histogram partitions the corpus exactly") {
    val out = SparkEntry.queries("q134_dup_size_hist")(spark, d).collect()
    drain()
    val total = Tables.documents(spark, d).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total,
      "histogram rows do not partition the corpus")
    assert(math.abs(out.map(_.getAs[Double]("pct_docs")).sum - 1.0) < 1e-9)
    for (r <- out)
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
  }

  test("q137: pair families are cliques, the giant family is a chain") {
    val out = SparkEntry.queries("q137_family_coherence")(spark, d).collect()
    drain()
    for (r <- out) {
      val c = r.getAs[Double]("coherence")
      assert(c > 0.0 && c <= 1.0, s"coherence out of range: $c")
      // a 2-family exists iff exactly its one pair was verified
      if (r.getAs[Long]("csz") == 2L) assert(c == 1.0, "size-2 family not a clique")
    }
    val giant = out.maxBy(_.getAs[Long]("csz"))
    assert(giant.getAs[Long]("csz") >= 10L, "no large family — chain detection unexercised")
    assert(giant.getAs[Double]("coherence") < 0.5,
      "the giant family is a clique — chain-collapse detection would be vacuous")
  }

  test("q138: fences bound the clipped tails and the winsorized mean") {
    val out = SparkEntry.queries("q138_winsorize")(spark, d).collect()
    drain()
    var moved = false
    for (r <- out) {
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_lo") <= n / 100, "more than 1% clipped below p01")
      assert(r.getAs[Long]("n_hi") <= n / 100, "more than 1% clipped above p99")
      val mw = r.getAs[Double]("mean_win")
      assert(mw >= r.getAs[Long]("p01_c") / 100.0 && mw <= r.getAs[Long]("p99_c") / 100.0)
      if (math.abs(mw - r.getAs[Double]("mean_raw")) > 1e-9) moved = true
    }
    assert(moved, "winsorization moved no mean — the clip never binds")
  }

  test("q131 on corpus: masks never exceed the doc and unpaired docs stay unmasked") {
    val out = SparkEntry.queries("q131_dup_mask_budget")(spark, d).collect()
    drain()
    assert(out.forall(r => r.getAs[Long]("masked_tokens") <= r.getAs[Long]("n_tokens")),
      "a doc masked more tokens than it has")
    val maskedDocs = out.count(_.getAs[Long]("masked_tokens") > 0L)
    assert(maskedDocs > 0, "no doc masked anything — threshold never binds")
    assert(maskedDocs < out.length, "every doc masked — threshold is vacuous")
  }
}
