package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral guard for compactJsonl (the small-files pass): per lang,
  * the compacted layout must hit the ⌈bytes/target⌉ file count and
  * reproduce the manifest's order-independent digest exactly — byte
  * content survives any file regrouping, which is precisely what the
  * digest was designed to certify.
  */
class CompactionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  private val d = "/root/testdata/sf0.001"

  test("compaction hits the target file count and preserves every lang's digest") {
    import graft.queries.PipelineQueries
    val out = s"/tmp/graft_compact_${System.nanoTime()}"
    PipelineQueries.materializeJsonl(spark, d, out)
    queries.releasePersisted()
    spark.catalog.clearCache()
    PipelineQueries.compactJsonl(spark, out)

    val manifest = spark.read.json(s"$out/corpus_jsonl_manifest")
      .select(col("lang"), col("n_rows").cast("long"), col("digest").cast("long"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val compactRoot = new java.io.File(s"$out/corpus_jsonl_compact")
    val dirs = compactRoot.listFiles().filter(_.getName.startsWith("lang="))
    assert(dirs.nonEmpty && dirs.length == manifest.size)
    for (dir <- dirs) {
      val lang = dir.getName.stripPrefix("lang=")
      val files = dir.listFiles().filter(_.getName.endsWith(".txt"))
      val bytes = new java.io.File(s"$out/corpus_jsonl/${dir.getName}")
        .listFiles().filter(_.getName.endsWith(".txt")).map(_.length).sum
      val want = math.max(1,
        ((bytes + PipelineQueries.CompactTargetBytes - 1) /
          PipelineQueries.CompactTargetBytes).toInt)
      assert(files.length == want, s"$lang file count ${files.length} != $want")
      val raw = files.flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
      val digest = raw.map { l =>
        val hex = md.digest(l.getBytes("UTF-8")).take(8)
          .map(b => f"$b%02x").mkString.take(15)
        BigInt(java.lang.Long.parseLong(hex, 16))
      }.foldLeft(BigInt(0))(_ + _)
        .mod(BigInt(PipelineQueries.ManifestMod)).toLong
      assert(manifest(lang) == ((raw.length.toLong, digest)),
        s"$lang content changed under compaction")
    }
    // the pass must actually merge somewhere: fewer files than before
    val before = new java.io.File(s"$out/corpus_jsonl").listFiles()
      .filter(_.getName.startsWith("lang="))
      .map(_.listFiles().count(_.getName.endsWith(".txt"))).sum
    val after = dirs.map(_.listFiles().count(_.getName.endsWith(".txt"))).sum
    assert(after <= before, s"compaction grew the file count: $before -> $after")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
