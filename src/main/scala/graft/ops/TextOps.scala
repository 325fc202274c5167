package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (SURVEY.md §2.11, EXT-2/EXT-4): tokenization, n-gram shingles,
  * polynomial hashing, MinHash, fingerprints, SimHash, language-ID,
  * quality scores. All pure Column folds over built-in higher-order
  * functions — deterministic, codegen'd, no UDFs, no transcendentals
  * (exp/log are not bit-stable across engines; +,*,/,sqrt are).
  */
object TextOps {

  /** Polynomial-hash modulus (1e9+7): keeps (h*31 + byte) within long. */
  val P: Long = 1000000007L

  /** Second modulus for [[graft.functions.ShingleHash]]'s dual-residue
    * mode (largest prime < 2³¹, CRT-independent of [[P]]): the packed
    * (h mod P)·2³¹ + (h mod P2) key collides at ~n²/2⁶² instead of a
    * single residue's n²/2³⁰ — the difference between "one false gram
    * match per 24k grams" and "none at corpus scale".
    */
  val P2: Long = 2147483647L

  /** 16-bit hash space for SimHash. */
  val P16: Long = 65536L

  /** Whitespace tokens (driver texts are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Evaluate `value` exactly once per row and pass it to `body` as a
    * lambda variable. Higher-order functions run interpreted (no codegen,
    * no common-subexpression elimination) and CollapseProject inlines
    * aliases into lambda bodies — so a multi-referenced expensive
    * expression gets re-evaluated per reference unless bound this way.
    */
  def bindOnce(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** BPE-ish subword count: runs of ≤4 letters, digits, or other
    * non-space symbols each count as one unit.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9 ]"), lit(0)))

  /** Left-fold polynomial char hash: h ← (h*31 + ascii) mod m, from 0.
    * Bit-identical to a DuckDB list_reduce over the same sequence (for
    * ASCII input). Backed by the native [[graft.functions.PolyHash]]
    * expression; [[charHashFold]] keeps the pure-built-in formulation for
    * cross-checking.
    */
  def charHash(s: Column, m: Long): Column =
    graft.functions.PolyHash(s, m)

  /** The same hash as a pure built-in higher-order-function fold —
    * reference implementation for the PolyHash equivalence property test.
    */
  def charHashFold(s: Column, m: Long): Column =
    aggregate(
      transform(sequence(lit(1), length(s)), i => ascii(s.substr(i, lit(1))).cast("long")),
      lit(0L),
      (h, x) => (h * 31 + x) % m)

  /** Rolling document fingerprint: nested fold — char-hash each token,
    * then fold token hashes with the same recurrence. Equals
    * Σ th_i · 31^(n−i) mod P (the power-sum form the oracle uses).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (h, t) => (h * 31 + charHash(t, P)) % P)

  /** Distinct word n-gram shingles from a *materialized* token-array
    * column. Callers must project the token array into a named column
    * first: higher-order functions are interpreted (no codegen, no
    * common-subexpression elimination), so an inline split() here would
    * re-tokenize the text for every element_at reference.
    */
  def shinglesFromTokens(t: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))
    // guard: sequence(1, x) with x < 1 steps *down* in Spark — short docs
    // must yield an empty shingle set, not negative indices
    array_distinct(when(size(t) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Non-distinct n-gram occurrences — one entry per position, unlike
    * [[shinglesFromTokens]] which dedups. Occurrence counting (Zipf /
    * coverage statistics) needs the multiplicity. Same short-doc guard.
    */
  def shingleOccurrences(t: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))
    when(size(t) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** 31^k mod P for k ≤ 63, as an array literal (index k+1, 1-based). */
  private val pow31: Column =
    typedlit((0 until 64).scanLeft(1L)((a, _) => a * 31 % P).take(64))

  /** 3-gram shingle hashes composed from per-token hashes without
    * building the shingle strings:
    * H(t1·' '·t2·' '·t3) = t1h·31^(2+|t2|+|t3|) + 32·31^(1+|t2|+|t3|)
    *                     + t2h·31^(1+|t3|) + 32·31^(|t3|) + t3h  (mod P)
    * — identical to charHash of the concatenated shingle, at ~1/7 the
    * fold steps. Not deduplicated: min-aggregation downstream is
    * insensitive to duplicates.
    */
  def shingleHashes3(toks: Column, tokHashes: Column): Column = {
    // fast path: table lookup for exponents < 64; fold fallback for
    // pathological token lengths (table miss would read past the array)
    def pw(k: Column): Column =
      when(k < 64, element_at(pow31, (k + 1).cast("int")))
        .otherwise(aggregate(sequence(lit(1L), k), lit(1L), (a, _) => a * 31 % P))
    val grams = transform(sequence(lit(1), size(toks) - 2), i => {
      val h1 = element_at(tokHashes, i)
      val h2 = element_at(tokHashes, i + 1)
      val h3 = element_at(tokHashes, i + 2)
      val l2 = length(element_at(toks, i + 1)).cast("long")
      val l3 = length(element_at(toks, i + 2)).cast("long")
      (h1 * pw(l2 + l3 + 2) % P
        + lit(32L) * pw(l2 + l3 + 1) % P
        + h2 * pw(l3 + 1) % P
        + lit(32L) * pw(l3) % P
        + h3) % P
    })
    when(size(toks) >= 3, grams).otherwise(array().cast("array<bigint>"))
  }

  /** MinHash signature value j over a *pre-hashed* shingle array
    * (hash once, derive all signatures): min of (a_j·h + b_j) mod P with
    * a_j = 2j+3, b_j = 5j+7.
    */
  def minhashFromHashes(hashArr: Column, j: Int): Column = {
    val a = 2L * j + 3
    val b = 5L * j + 7
    array_min(transform(hashArr, h => (lit(a) * h + lit(b)) % P))
  }

  /** 16-bit SimHash: per token a 16-bit polynomial hash votes ±1 on each
    * bit; the sign of each bit-sum forms the fingerprint.
    */
  def simhash16(text: Column): Column = {
    val powers = typedlit((0 until 16).map(b => 1L << b))
    val counts = aggregate(
      tokens(text),
      typedlit(Seq.fill(16)(0L)),
      (acc, t) => {
        val th = charHash(t, P16)
        zip_with(acc, powers, (a, pw) =>
          a + when((th / pw).cast("long") % 2 === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(counts, powers, (c, pw) => when(c > 0, pw).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }

  /** Tokens per "line" for the sub-document dedup/repetition unit. The
    * driver corpus has no newlines, so lines are fixed-width token
    * chunks — the same explode/hash/re-aggregate plumbing applies
    * verbatim when real newline-split lines exist.
    */
  val LineTokens = 8

  /** Fixed-width token-chunk "lines" of a materialized token array:
    * chunk i (1-based) = tokens (i−1)·w+1 … i·w joined by spaces; the
    * tail chunk keeps whatever remains. Any non-empty text yields ≥ 1
    * line (split returns ≥ 1 token), so `sequence(1, n)` never sees
    * n < 1 (which would DESCEND — invariant 5).
    */
  def lineArray(t: Column, width: Int = LineTokens): Column =
    transform(
      sequence(lit(1), floor((size(t) + lit(width - 1)) / lit(width)).cast("int")),
      i => concat_ws(" ", slice(t, (i - 1) * width + 1, lit(width))))

  /** Fraction of n-gram OCCURRENCES that are repeats of an earlier gram
    * in the same document: (total − distinct) / total, 0 for docs with
    * fewer than n tokens. Exact rational in doubles — the Gopher-style
    * repetition signal, computed over the native [[graft.functions.ShingleHash]]
    * gram hashes (the oracle hashes its gram strings to the same values).
    */
  def dupNgramFrac(text: Column, n: Int): Column =
    bindOnce(graft.functions.ShingleHash(text, P, n)) { a =>
      when(size(a) === 0, lit(0.0))
        .otherwise((size(a) - size(array_distinct(a))).cast("double") / size(a))
    }

  /** Fraction of "lines" ([[lineArray]]) that duplicate an earlier line
    * of the same document — the duplicate-line-fraction quality signal.
    * Compares line STRINGS (no hashing; strings are engine-exact).
    */
  def dupLineFrac(text: Column): Column =
    bindOnce(tokens(text)) { t =>
      bindOnce(lineArray(t)) { ls =>
        (size(ls) - size(array_distinct(ls))).cast("double") / size(ls)
      }
    }

  /** Language marker words (subsets of the driver corpus vocabulary),
    * disjoint per language, alphabetical language order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("scan", "merge", "window"),
    "en" -> Seq("the", "fast", "data"),
    "es" -> Seq("sort", "table", "query"),
    "fr" -> Seq("join", "group", "row"),
    "zh" -> Seq("hash", "filter", "stream"))

  /** Marker-word occurrence count (with multiplicity) for one language. */
  def langScore(text: Column, lang: String): Column = {
    val markers = typedlit(langMarkers.toMap.apply(lang))
    size(filter(tokens(text), t => array_contains(markers, t)))
  }

  /** N-gram-heuristic language ID: argmax marker score, ties resolved to
    * the alphabetically first language (CASE chain, mirrored verbatim in
    * the oracle).
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }.toMap
    val Seq(de, en, es, fr, zh) = Seq("de", "en", "es", "fr", "zh").map(scores)
    when(de >= en && de >= es && de >= fr && de >= zh, "de")
      .when(en >= es && en >= fr && en >= zh, "en")
      .when(es >= fr && es >= zh, "es")
      .when(fr >= zh, "fr")
      .otherwise("zh")
  }

  /** Quality score: linear blend of avg token length, stopword ratio and
    * digit ratio, clamped to [0,1] — deliberately transcendental-free.
    */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val nChars = length(text).cast("double")
    val avgTokLen = nChars / nTok
    val stopwords = typedlit(Seq("the", "a", "of", "and"))
    val stopRatio = size(filter(tokens(text), t => array_contains(stopwords, t))).cast("double") / nTok
    val digitRatio = length(regexp_replace(text, "[^0-9]", "")).cast("double") / nChars
    greatest(lit(0.0), least(lit(1.0),
      lit(0.05) * avgTokLen + lit(0.5) * stopRatio - lit(0.1) * digitRatio))
  }
}
