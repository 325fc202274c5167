package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlIngest

/** The quarantine ingest contract: every input line lands in exactly
  * one of (parsed, quarantine); malformed JSON and type violations
  * quarantine with their raw text intact (replayable); missing fields
  * parse as null (absence is data, malformation is an error).
  */
class JsonlIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("score", DoubleType)))

  test("lines split exactly into parsed + quarantine; raw lines replay") {
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha", "score": 0.5}""",
      """{"doc_id": 2, "text": "beta"}""", // missing field -> parsed, null score
      """{"doc_id": "not-a-number", "text": "gamma", "score": 1.0}""", // type violation
      """{"doc_id": 4, "text": "delta", "score":""", // truncated JSON
      """not json at all""",
      """{"doc_id": 5, "text": "epsilon", "score": 2.25}""")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_ingest").toFile
    val f = new java.io.File(dir, "part.jsonl")
    java.nio.file.Files.write(f.toPath,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      val r = JsonlIngest.read(spark, f.getAbsolutePath, schema)
      val parsed = r.parsed.collect().map(x =>
        (x.getAs[Any]("doc_id"), x.getAs[String]("text"), x.getAs[Any]("score")))
      val quarantined = r.quarantine.collect().map(_.getString(0)).toSet
      r.release()
      assert(parsed.length + quarantined.size == lines.length,
        "a line vanished: parsed + quarantined != input")
      assert(parsed.map(_._2).toSet == Set("alpha", "beta", "epsilon"))
      // missing field is null, not quarantined
      assert(parsed.exists(p => p._2 == "beta" && p._3 == null))
      // type violation and malformed lines quarantine with raw text intact
      assert(quarantined.exists(_.contains("not-a-number")))
      assert(quarantined.contains("not json at all"))
      assert(quarantined.exists(_.startsWith("""{"doc_id": 4""")))
      // quarantined lines are replayable: fixing the bad value re-parses
      val fixed = quarantined.map(_.replace("\"not-a-number\"", "3")).toSeq
      val f2 = new java.io.File(dir, "replay.jsonl")
      java.nio.file.Files.write(f2.toPath,
        fixed.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val r2 = JsonlIngest.read(spark, f2.getAbsolutePath, schema)
      val replayed = r2.parsed.collect()
      r2.release()
      assert(replayed.exists(_.getAs[Long]("doc_id") == 3L),
        "fixed line did not re-parse through the same reader")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("schema may not claim the corrupt-record column") {
    val bad = StructType(Seq(StructField("_corrupt_record", StringType)))
    intercept[IllegalArgumentException] {
      JsonlIngest.read(spark, "/tmp/nonexistent.jsonl", bad)
    }
  }
}
