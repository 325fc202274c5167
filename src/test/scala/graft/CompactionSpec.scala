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
    // the sf0.001 export lands each lang in ONE file, which would make
    // the merge path vacuous — fragment every lang into per-half files
    // on disk first (content unchanged, so the manifest still holds;
    // the digest is order-independent by design)
    for (dir <- new java.io.File(s"$out/corpus_jsonl").listFiles()
        if dir.getName.startsWith("lang=")) {
      for (f <- dir.listFiles() if f.getName.endsWith(".txt")) {
        val lines = scala.io.Source.fromFile(f, "UTF-8").getLines().toVector
        if (lines.length >= 2) {
          val (a, b) = lines.splitAt(lines.length / 2)
          java.nio.file.Files.write(f.toPath, a.mkString("\n").concat("\n").getBytes("UTF-8"))
          java.nio.file.Files.write(
            new java.io.File(dir, s"split-${f.getName}").toPath,
            b.mkString("\n").concat("\n").getBytes("UTF-8"))
          // the Hadoop local FS keeps .crc sidecars; the rewritten
          // bytes no longer match them
          new java.io.File(dir, s".${f.getName}.crc").delete()
        }
      }
    }
    // Spark's FileStatusCache still holds the pre-split file lengths
    spark.catalog.refreshByPath(s"$out/corpus_jsonl")
    PipelineQueries.compactJsonl(spark, out)

    val manifest = spark.read.json(s"$out/corpus_jsonl_manifest")
      .select(col("lang"), col("n_rows").cast("long"), col("digest").cast("long"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
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
      assert(manifest(lang) == ((raw.length.toLong, TestDigest.of(raw))),
        s"$lang content changed under compaction")
    }
    // the pass must actually merge on this fixture — STRICTLY fewer
    // files (a 1:1 copy regression or a fixture that never exercises
    // merging must both fail here)
    val before = new java.io.File(s"$out/corpus_jsonl").listFiles()
      .filter(_.getName.startsWith("lang="))
      .map(_.listFiles().count(_.getName.endsWith(".txt"))).sum
    val after = dirs.map(_.listFiles().count(_.getName.endsWith(".txt"))).sum
    assert(after < before, s"compaction merged nothing: $before -> $after")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
