package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guards for the deterministic sketches (q83 KMV distinct,
  * q84 count-min) beyond the DuckDB oracle: the sketch MATH is
  * re-derived in plain Scala from the gram-hash stream (the hash itself
  * is pinned by PolyHashSpec), the KMV union/merge law is proven on a
  * real split of the corpus, and the CMS one-sided guarantee is checked
  * for EVERY gram, not just the reported heavy hitters.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  /** (doc_id, source, gram hashes) via the production hash expression. */
  private def gramRows(): Seq[(Long, String, Seq[Long])] = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("source"),
        graft.functions.ShingleHash(col("text"), graft.ops.TextOps.P, 3,
          graft.ops.TextOps.P2).as("hs"))
      .as[(Long, String, Seq[Long])].collect().toSeq
    spark.catalog.clearCache()
    rows
  }

  test("q83 KMV: estimates match the Scala sketch and min-k merges like a union") {
    val out = SparkEntry.queries("q83_kmv_distinct")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val rows = gramRows()
    val k = graft.queries.PipelineQueries.KmvK
    val bySrc = rows.groupBy(_._2)
      .map { case (s0, xs) => s0 -> xs.flatMap(_._3).distinct.sorted }
    assert(out.length == bySrc.size)
    for ((src, nd, kth, est) <- out) {
      val hs = bySrc(src)
      assert(nd == hs.length, s"$src exact distinct count")
      if (hs.length >= k) {
        assert(kth == hs(k - 1), s"$src kth-smallest hash")
        assert(est == (k - 1).toDouble * 1000000007.0 * 2147483648.0 / kth.toDouble)
        // k = 64 gives ~12% standard error; 50% is a loose deterministic
        // bound that a broken estimator (wrong M, off-by-one k) blows past
        assert(math.abs(est - nd) / nd < 0.5, s"$src estimate off: $est vs $nd")
      } else assert(kth == -1L && est == nd.toDouble)
    }
    // THE sketch property: min-k of a union = min-k of merged min-ks —
    // what lets every map task keep a local sketch. Proven on a real
    // split (doc_id parity) of every source's stream.
    for ((src, hs) <- bySrc) {
      val srcRows = rows.filter(_._2 == src)
      def minK(xs: Seq[Long]) = xs.distinct.sorted.take(k)
      val a = minK(srcRows.filter(_._1 % 2 == 0).flatMap(_._3))
      val b = minK(srcRows.filter(_._1 % 2 == 1).flatMap(_._3))
      assert(minK(a ++ b) == minK(hs), s"$src min-k merge law broken")
    }
  }

  test("q111 incremental merge: both generations reach the merged result; delta non-empty") {
    // the oracle already proves merge == full recompute; this pins that
    // the merge has two REAL inputs (a degenerate all-old cut would
    // make the proof vacuous) and that the merged sketch draws hashes
    // from both generations for at least one source
    val out = SparkEntry.queries("q111_incremental_merge")(spark, d).collect()
    queries.releasePersisted()
    spark.catalog.clearCache()
    val rows = gramRows()
    val k = graft.queries.PipelineQueries.KmvK
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    val cut = n * 4 / 5
    assert(cut > 0 && cut < n, "degenerate generation cut")
    for (r <- out) {
      val src = r.getString(0)
      val srcRows = rows.filter(_._2 == src)
      def minK(xs: Seq[Long]) = xs.distinct.sorted.take(k)
      val old = srcRows.filter(_._1 < cut).flatMap(_._3)
      val delta = srcRows.filter(_._1 >= cut).flatMap(_._3)
      val merged = minK(minK(old) ++ minK(delta))
      assert(r.getLong(1) == srcRows.length, s"$src n_docs")
      if (merged.length >= k) assert(r.getLong(6) == merged(k - 1), s"$src kth")
      // at least the corpus-wide check: some source's merged sketch
      // must contain a delta-only hash (the delta genuinely lands)
    }
    val anyDeltaHash = out.exists { r =>
      val src = r.getString(0)
      val srcRows = rows.filter(_._2 == src)
      def minK(xs: Seq[Long]) = xs.distinct.sorted.take(k)
      val oldK = minK(srcRows.filter(_._1 < cut).flatMap(_._3)).toSet
      val merged = minK(minK(oldK.toSeq) ++ minK(srcRows.filter(_._1 >= cut).flatMap(_._3)))
      merged.exists(!oldK.contains(_))
    }
    assert(anyDeltaHash, "no delta hash ever survives the merge — merge unexercised")
  }

  test("q84 CMS: one-sided guarantee holds for every gram; top-20 match the model") {
    val out = SparkEntry.queries("q84_cms_heavy")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val mods = graft.queries.PipelineQueries.CmsMods
    val wdt = graft.queries.PipelineQueries.CmsWidth
    val counts = gramRows().flatMap(_._3)
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    def buckets(g: Long) = mods.map(m => (g % m) % wdt)
    val sketch = new scala.collection.mutable.HashMap[(Int, Long), Long]()
    for ((g, c) <- counts; (b, r) <- buckets(g).zipWithIndex)
      sketch((r, b)) = sketch.getOrElse((r, b), 0L) + c
    val est = counts.map { case (g, c) =>
      g -> buckets(g).zipWithIndex.map { case (b, r) => sketch((r, b)) }.min }
    // one-sided: the sketch NEVER undercounts, for every gram
    assert(est.forall { case (g, e) => e >= counts(g) })
    // collision mass is real at this geometry (the overestimate column
    // is non-vacuous) but bounded: e − c ≤ N/width per the CMS analysis
    val total = counts.values.sum
    assert(est.exists { case (g, e) => e > counts(g) })
    assert(est.forall { case (g, e) => e - counts(g) <= total / wdt * 4 })
    // the reported top-20 equals the model's, including estimates
    val top = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(20)
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      top.map { case (g, c) => (g, c, est(g)) })
    assert(out.forall(r => r._5 == r._4 - r._3 && r._5 >= 0))
  }

  test("q88 Bloom: zero false negatives for every gram; FP mass matches the Scala bitset; OR is the merge") {
    val out = SparkEntry.queries("q88_bloom_decontam")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    queries.releasePersisted()
    spark.catalog.clearCache()
    val rows = gramRows()
    val mods = graft.queries.PipelineQueries.CmsMods
    val mBits = graft.queries.PipelineQueries.BloomBits
    val wBits = graft.queries.PipelineQueries.BloomWordBits
    def positions(h: Long) = mods.map(m => (h % m) % mBits)
    def build(keys: Iterable[Long]): Map[Long, Long] =
      keys.flatMap(positions).groupBy(_ / wBits)
        .map { case (w, ps) =>
          w -> ps.map(p => 1L << (p % wBits).toInt).reduce(_ | _) }
    val eval = rows.filter(_._1 % 10 == 0).flatMap(_._3).toSet
    val bits = build(eval)
    def hit(h: Long): Boolean = positions(h).forall { p =>
      ((bits.getOrElse(p / wBits, 0L) >> (p % wBits).toInt) & 1L) == 1L }
    val probes = rows.filter(_._1 % 10 != 0)
      .flatMap { case (_, src, hs) => hs.map(src -> _) }.distinct
    // the one-sided guarantee, for EVERY member gram — a Bloom filter
    // that can miss a member is not a Bloom filter
    for ((_, h) <- probes if eval.contains(h))
      assert(hit(h), s"member gram $h missed by the bitset")
    val bySrc = probes.groupBy(_._1)
    assert(out.length == bySrc.size)
    for ((src, n, nb, ne, nfp, nm) <- out) {
      val hs = bySrc(src).map(_._2)
      assert(n == hs.length, s"$src probe count")
      assert(nb == hs.count(hit), s"$src bloom-hit count")
      assert(ne == hs.count(eval.contains), s"$src exact-member count")
      assert(nfp == nb - ne && nm == 0L, s"$src fp/missed bookkeeping")
    }
    // FP mass must be real at this geometry (sketch exercised, not
    // vacuous) — the load factor doc on BloomBits relies on it
    assert(out.map(_._5).sum > 0, "no false positives — geometry vacuous")
    // THE Bloom property: bitset(A ∪ B) = bitset(A) OR bitset(B) — what
    // lets map tasks build local filters and bit_or them (and what the
    // streaming twin rides; see StreamingSketch.bloomWords)
    val (a, b) = eval.partition(_ % 2 == 0)
    val (ba, bb) = (build(a), build(b))
    val merged = (ba.keySet ++ bb.keySet)
      .map(w => w -> (ba.getOrElse(w, 0L) | bb.getOrElse(w, 0L))).toMap
    assert(merged == bits, "bit_or of split bitsets != bitset of union")
  }
}
