package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SURVEY.md §5.2). */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** THE reference model of the JSONL manifest digest (first-15-hex
  * sha256 prefix per line, exact sum mod ManifestMod) — one
  * definition for every spec that certifies file contents
  * (CorpusPipelineSpec, CompactionSpec), mirroring the single Spark
  * expression in PipelineQueries.writeJsonlManifest.
  */
object TestDigest {
  def of(lines: Iterable[String]): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    lines.map { l =>
      val hex = md.digest(l.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15)
      BigInt(java.lang.Long.parseLong(hex, 16))
    }.foldLeft(BigInt(0))(_ + _)
      .mod(BigInt(graft.queries.PipelineQueries.ManifestMod)).toLong
  }
}
