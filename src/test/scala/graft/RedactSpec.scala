package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Redact

/** PII scrub (ops.Redact) against hostile and edge inputs: near-miss
  * look-alikes, adjacency, placeholder injection, null/empty text. The
  * cross-engine byte-equality of the well-formed path is q63's oracle;
  * this spec pins the operator's contract on the inputs an adversarial
  * corpus actually contains.
  */
class RedactSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def run(texts: Seq[String]): Seq[(String, Int, Int, Int)] = {
    import spark.implicits._
    texts.toDF("t")
      .select(
        Redact.redact(col("t")).as("clean"),
        Redact.countMatches(col("t"), Redact.EmailRe).as("ne"),
        Redact.countMatches(col("t"), Redact.Ipv4Re).as("ni"),
        Redact.countMatches(col("t"), Redact.PhoneRe).as("np"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
  }

  test("clean text passes through untouched with zero counts") {
    assert(run(Seq("no pii in this sentence", "")) ===
      Seq(("no pii in this sentence", 0, 0, 0), ("", 0, 0, 0)))
  }

  test("each PII class redacts globally and counts every match") {
    assert(run(Seq("x@y.io then z.w@mail.example.org end")) ===
      Seq(("<EMAIL> then <EMAIL> end", 2, 0, 0)))
    assert(run(Seq("from 10.0.0.1 to 192.168.255.254")) ===
      Seq(("from <IP> to <IP>", 0, 2, 0)))
    assert(run(Seq("call 555-0142 or 555-9999")) ===
      Seq(("call <PHONE> or <PHONE>", 0, 0, 2)))
  }

  test("hostile near-misses: wrong shapes survive, look-alikes are scrubbed") {
    assert(run(Seq(
      "v1.2.3 release notes",      // 3 octets — not an IP shape
      "123-4567890 is an id",      // no word boundary after 4 digits
      "at x @ y.io spaced out",    // spaced @ breaks the email shape
      "999.999.999.999 overflow", // out-of-range octets: still redacted
      "1.2.3.4.5 five parts"       // leftmost quad wins, tail survives
    )) === Seq(
      ("v1.2.3 release notes", 0, 0, 0),
      ("123-4567890 is an id", 0, 0, 0),
      ("at x @ y.io spaced out", 0, 0, 0),
      ("<IP> overflow", 0, 1, 0),
      ("<IP>.5 five parts", 0, 1, 0)))
  }

  test("adjacent PII classes and placeholder injection stay stable") {
    // phone hard against a redacted email's tag; pre-seeded tags inert
    assert(run(Seq("a@b.co 555-0000", "<EMAIL> fake tag 1.2.3.4")) ===
      Seq(("<EMAIL> <PHONE>", 1, 0, 1), ("<EMAIL> fake tag <IP>", 0, 1, 0)))
  }

  test("null text propagates as null, not a crash") {
    import spark.implicits._
    val r = Seq[Option[String]](None, Some("x@y.io")).toDF("t")
      .select(Redact.redact(col("t")).as("c"),
        Redact.countMatches(col("t"), Redact.EmailRe).as("n"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getString(0) == "<EMAIL>" && r(1).getInt(1) == 1)
  }
}
