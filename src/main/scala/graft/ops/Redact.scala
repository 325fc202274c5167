package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII / boilerplate scrubbing for corpus materialization: regex
  * redaction of emails, IPv4 addresses, and phone-shaped digit runs,
  * with per-document match counts (the audit columns a scrub pass
  * ships alongside the cleaned text).
  *
  * Patterns stay inside the RE2 ∩ java.util.regex common dialect
  * (character classes, bounded repetition, `\b` word boundaries — no
  * backrefs, no lookaround), so Spark's `regexp_replace` (global by
  * default) and DuckDB's `regexp_replace(…, 'g')` transform byte-for-
  * byte identically and the operator is fully oracle-able. Redaction
  * applies email → IP → phone in that fixed order; placeholders
  * contain no digits or `@`, so no pass can manufacture a match for a
  * later one. Counts are measured on the ORIGINAL text.
  *
  * Per-row scalar work only (one codegen'd projection) — at 100 TB the
  * scrub rides the corpus scan with zero shuffle.
  */
object Redact {

  /** Email: local part @ dotted domain + alphabetic TLD (≥ 2 chars). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4-shaped dotted quad (1–3 digit octets; range-validation is
    * [[Colors.isValidIp]]'s job — a scrubber redacts look-alikes too).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-shaped NNN-NNNN digit run (word-bounded). */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** Count of pattern matches in `c` (pre-redaction). */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Redacted text: email → IP → phone, each global. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)

  /** The same chain as DuckDB SQL over a column expression (the oracle
    * twin — kept next to the patterns so they can never drift apart).
    * DuckDB needs the explicit 'g' flag for global replacement;
    * backslashes in DuckDB string literals are literal, so the patterns
    * embed verbatim (they contain no single quotes).
    */
  def redactSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($expr, '$EmailRe', '$EmailTag', 'g'), " +
      s"'$Ipv4Re', '$IpTag', 'g'), '$PhoneRe', '$PhoneTag', 'g')"

  /** Match-count as DuckDB SQL (INT to match Spark's `size`). */
  def countSql(expr: String, re: String): String =
    s"CAST(len(regexp_extract_all($expr, '$re')) AS INT)"
}
