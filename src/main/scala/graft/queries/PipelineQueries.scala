package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.TextOps

/** The end-to-end corpus-materialization pipeline — the one artifact an
  * LLM-data user actually ships (SURVEY.md §2.11 north star). Composes
  * the individually-proven stages into a single funnel over `documents`:
  *
  *  1. dedup      — keep one representative per near-dup cluster
  *                  ([[TextQueries.simhash64Pairs]] → [[graft.ops.Dedup]]
  *                  connected components, as q56);
  *  2. quality    — [[TextOps.qualityScore]] ≥ [[QualityThreshold]];
  *  3. decontam   — drop the held-out eval split (doc_id % 10 = 0)
  *                  entirely, plus any doc whose distinct trigrams
  *                  overlap the eval split's trigram set by ≥
  *                  [[ContamThreshold]] (q53's join shape, inverted:
  *                  corpus postings left-join the eval gram SET — linear,
  *                  never corpus × eval);
  *  4. sample     — q55's deterministic per-doc stratified hash test.
  *
  * Every stage is a per-doc FLAG computed in one shared scan+join DAG —
  * the funnel aggregates cumulative conjunctions, so no stage rescans
  * the corpus. All four predicates are deterministic and engine-exact,
  * which is what makes the whole funnel oracle-able in DuckDB
  * (recursive-CTE components + identical scalar expressions).
  *
  * At 100 TB: the flag DAG is the corpus scan + three dup-population/
  * vocabulary-sized joins (cluster labels, contamination fractions —
  * both broadcastable in practice), and [[materialize]]'s write is a
  * plain partitioned parquet append of the surviving rows — no extra
  * shuffle beyond `partitionBy`'s file split.
  */
object PipelineQueries {

  /** Keeps ~2/3 of this corpus (score range is 0.24–0.36 at sf0.01). */
  val QualityThreshold = 0.3
  /** Trigram-overlap fraction at/above which a doc is contaminated. */
  val ContamThreshold = 0.5

  /** Per-document stage flags:
    * `(doc_id, source, lang, f_dedup, f_quality, f_decontam, f_sample)`.
    */
  private[queries] def stageFlags(s: SparkSession, d: String): DataFrame = {
    // stage 1: connected components over the verified near-dup pairs
    val pairs = tracked(TextQueries.simhash64Pairs(s, d).select(col("da"), col("db")))
    val lbl = graft.ops.Dedup.fromPairs(pairs, track = tracked)
    // stage 3: contamination fraction of each non-eval doc's distinct
    // trigrams vs the eval split's trigram set (q53 inverted)
    val hs = tracked(documents(s, d)
      .select(col("doc_id"),
        array_distinct(graft.functions.ShingleHash(col("text"), TextOps.P, 3)).as("hs"))
      .filter(size(col("hs")) > 0))
    val evalSet = hs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(col("hs")).as("w")).distinct()
    val corpusGrams = hs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("w"))
    val contam = corpusGrams
      .join(evalSet.withColumn("hit", lit(1)), Seq("w"), "left")
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("nc"))
      .select(col("doc_id"), (col("nc").cast("double") / col("n")).as("frac"))
    documents(s, d).select(col("doc_id"), col("source"), col("lang"),
        TextOps.qualityScore(col("text")).as("quality"))
      .join(lbl.select(col("id").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("lang"),
        (col("lbl").isNull || col("lbl") === col("doc_id")).cast("int").as("f_dedup"),
        (col("quality") >= QualityThreshold).cast("int").as("f_quality"),
        (pmod(col("doc_id"), lit(10)) =!= 0 &&
          coalesce(col("frac"), lit(0.0)) < ContamThreshold).cast("int").as("f_decontam"),
        (TextQueries.sampleHash < TextQueries.sampleRateBp).cast("int").as("f_sample"))
  }

  /** EXT — the per-source materialization funnel: how many docs survive
    * each cumulative stage. The row a pipeline operator watches before
    * shipping a corpus.
    */
  val q57CorpusFunnel: Q = (s, d) => {
    stageFlags(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("f_dedup")).as("n_dedup"),
        sum(col("f_dedup") * col("f_quality")).as("n_quality"),
        sum(col("f_dedup") * col("f_quality") * col("f_decontam")).as("n_decontam"),
        sum(col("f_dedup") * col("f_quality") * col("f_decontam") * col("f_sample"))
          .as("n_sample"))
      .orderBy(col("source"))
  }

  /** Materialize the surviving corpus as lang-partitioned parquet under
    * `outDir/corpus` and return the shipped row count. The write is the
    * flags join + a row filter + `partitionBy` — the at-scale shape
    * (one pass, no pre-write shuffle; file sizes follow the input
    * partitioning).
    */
  def materialize(s: SparkSession, d: String, outDir: String): Long = {
    val flags = stageFlags(s, d)
      .filter(col("f_dedup") === 1 && col("f_quality") === 1 &&
        col("f_decontam") === 1 && col("f_sample") === 1)
      .select(col("doc_id"), col("source"), col("lang"))
    val shipped = documents(s, d).join(flags.select(col("doc_id")), Seq("doc_id"))
    shipped.write.mode("overwrite").partitionBy("lang")
      .parquet(s"$outDir/corpus")
    s.read.parquet(s"$outDir/corpus").count()
  }

  /** Document-frequency bounds for [[q58VocabPrune]]: a token must
    * appear in ≥ 2 documents (hapax noise) and ≤ 40% of the corpus
    * (stopword mass). The upper bound is evaluated as the INTEGER
    * comparison `df · 5 ≤ n_docs · 2` on both engines — no float
    * threshold to disagree about.
    */
  val VocabMinDf = 2

  /** EXT — df-bounded vocabulary pruning (the tokenizer-prep pass that
    * trims hapax legomena and stopword mass before BPE training):
    * corpus-wide token document frequencies gate a kept-vocabulary set;
    * each document reports how much of its token stream and of its
    * distinct vocabulary survives. Shapes: one explode, one distinct
    * (doc, token) aggregate for df, the kept SET joined back to the
    * postings (vocabulary-sized build side), one per-doc aggregate —
    * all hash shuffles, linear in corpus + vocabulary.
    */
  val q58VocabPrune: Q = (s, d) => {
    val tok = tracked(documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w")))
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val df = tok.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val kept = df.crossJoin(broadcast(nDocs))
      .filter(col("df") >= VocabMinDf && col("df") * 5 <= col("n_docs") * 2)
      .select(col("w"), lit(1).as("hit"))
    tok.join(kept, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("hit"), lit(0))).as("n_kept"),
        countDistinct(col("w")).as("n_vocab"),
        countDistinct(when(col("hit") === 1, col("w"))).as("n_vocab_kept"))
      .withColumn("frac_kept", col("n_kept").cast("double") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        col("n_vocab"), col("n_vocab_kept"), col("frac_kept"))
      .orderBy(col("doc_id"))
  }

  /** [[q59BigramLift]] gates: a bigram must occur ≥ this many times. */
  val LiftMinPair = 20
  /** Top-k collocations reported. */
  val LiftTopK = 25

  /** EXT — collocation mining (phrase extraction for tokenizer merges /
    * n-gram features): consecutive token pairs scored by lift =
    * P(w1 w2) / (P(w1)·P(w2)) — computed as the exact rational
    * `(n_pair·N_tok) / (n_w1·n_w2)` in doubles with the identical
    * association on both engines (invariant 4: ratios, never log-PMI —
    * transcendentals aren't cross-engine bit-stable). Shapes: the bigram
    * explode rides the same scan as the unigram count; both aggregates
    * are map-side-combining hash shuffles over vocabulary-sized key
    * spaces; the final top-k sorts only the gated survivors.
    */
  val q59BigramLift: Q = (s, d) => {
    // persisted: the unigram and bigram branches both read the tokenized
    // corpus (invariant 6 — one scan + tokenize, not two)
    val toks = tracked(documents(s, d).select(TextOps.tokens(col("text")).as("t")))
    val uni = tracked(toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n")))
    val nTot = uni.agg(sum(col("n")).as("n_tok"))
    val pairs = toks
      .select(explode(expr(
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), (w, i) -> struct(w as w1, t[i + 1] as w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= LiftMinPair)
    pairs
      .join(uni.select(col("w").as("w1"), col("n").as("n1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n2")), Seq("w2"))
      .crossJoin(broadcast(nTot))
      .withColumn("lift",
        (col("n_pair").cast("double") * col("n_tok").cast("double"))
          / (col("n1").cast("double") * col("n2").cast("double")))
      .select(col("w1"), col("w2"), col("n_pair"), col("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(LiftTopK)
  }

  /** EXT — per-source token budget under the sampling policy: what the
    * q55 mix weights actually buy in TOKENS (the unit a training run is
    * budgeted in), per stratum and as a share of the final corpus. One
    * scan + one 20-group aggregate + a broadcast 1-row total — the
    * report a data-mix owner refreshes per corpus version.
    */
  val q60TokenBudget: Q = (s, d) => {
    val t = documents(s, d).select(col("source"),
      size(TextOps.tokens(col("text"))).as("n_tok"),
      (TextQueries.sampleHash < TextQueries.sampleRateBp).cast("int").as("kept"))
    val per = t.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_tok") * col("kept")).as("n_tokens_sampled"))
    val tot = per.agg(sum(col("n_tokens_sampled")).as("tt"))
    per.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_tokens_sampled").cast("double") / col("tt").cast("double"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_tokens_sampled"), col("share"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "q57_corpus_funnel" -> q57CorpusFunnel,
    "q58_vocab_prune"   -> q58VocabPrune,
    "q59_bigram_lift"   -> q59BigramLift,
    "q60_token_budget"  -> q60TokenBudget,
  )

  private def q57OracleSql: String =
    TextQueries.simhashPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
      TextQueries.ccCtes +
      s"""tk3 AS (SELECT doc_id, string_split(text, ' ') AS t0 FROM documents),
      |g3 AS (
      |  SELECT doc_id, list_transform(generate_series(1, greatest(len(t0) - 2, 0)),
      |    i -> t0[i] || ' ' || t0[i+1] || ' ' || t0[i+2]) AS gs
      |  FROM tk3 WHERE len(t0) >= 3),
      |hs3 AS (
      |  SELECT doc_id, list_distinct(list_transform(gs,
      |    s -> list_reduce(list_transform(generate_series(1, length(s)), i -> CAST(ascii(s[i]) AS BIGINT)),
      |           (a, x) -> (a * 31 + x) % 1000000007))) AS hs
      |  FROM g3 WHERE len(gs) > 0),
      |co3 AS (SELECT doc_id, len(hs) AS n, unnest(hs) AS w FROM hs3 WHERE doc_id % 10 <> 0),
      |ev3 AS (SELECT DISTINCT unnest(hs) AS w FROM hs3 WHERE doc_id % 10 = 0),
      |fr3 AS (
      |  SELECT co3.doc_id,
      |    CAST(sum(CASE WHEN ev3.w IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / co3.n AS frac
      |  FROM co3 LEFT JOIN ev3 ON co3.w = ev3.w GROUP BY co3.doc_id, co3.n),
      |qual AS (
      |  SELECT doc_id, greatest(0.0, least(1.0,
      |    0.05 * (CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')))
      |    + 0.5 * (CAST(len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','of','and'], x))) AS DOUBLE) / len(string_split(text, ' ')))
      |    - 0.1 * (CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)))) AS quality
      |  FROM documents),
      |flags AS (
      |  SELECT d.source,
      |    CASE WHEN c.lbl IS NULL OR c.lbl = d.doc_id THEN 1 ELSE 0 END AS f_dedup,
      |    CASE WHEN q.quality >= $QualityThreshold THEN 1 ELSE 0 END AS f_quality,
      |    CASE WHEN d.doc_id % 10 <> 0 AND COALESCE(f.frac, 0.0) < $ContamThreshold THEN 1 ELSE 0 END AS f_decontam,
      |    CASE WHEN ${TextQueries.sampleHashSql.replace("doc_id", "d.doc_id")} < ${TextQueries.sampleRateBpSql.replace("source", "d.source")} THEN 1 ELSE 0 END AS f_sample
      |  FROM documents d
      |  LEFT JOIN cl c ON d.doc_id = c.id
      |  LEFT JOIN qual q ON d.doc_id = q.doc_id
      |  LEFT JOIN fr3 f ON d.doc_id = f.doc_id)
      |SELECT source, count(*) AS n_total,
      |  CAST(sum(f_dedup) AS BIGINT) AS n_dedup,
      |  CAST(sum(f_dedup * f_quality) AS BIGINT) AS n_quality,
      |  CAST(sum(f_dedup * f_quality * f_decontam) AS BIGINT) AS n_decontam,
      |  CAST(sum(f_dedup * f_quality * f_decontam * f_sample) AS BIGINT) AS n_sample
      |FROM flags GROUP BY source
      |ORDER BY source""".stripMargin

  val oracles: Map[String, String] = Map(
    "q57_corpus_funnel" -> q57OracleSql,
    "q58_vocab_prune" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
        |kept AS (SELECT w FROM dfq, nd WHERE df >= $VocabMinDf AND df * 5 <= n_docs * 2),
        |per AS (
        |  SELECT t.doc_id,
        |    count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN k.w IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
        |    count(DISTINCT t.w) AS n_vocab,
        |    count(DISTINCT CASE WHEN k.w IS NULL THEN NULL ELSE t.w END) AS n_vocab_kept
        |  FROM tok t LEFT JOIN kept k ON t.w = k.w
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_kept, n_vocab, n_vocab_kept,
        |  CAST(n_kept AS DOUBLE) / n_tokens AS frac_kept
        |FROM per ORDER BY doc_id""".stripMargin,
    "q59_bigram_lift" ->
      s"""WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |un AS (SELECT w, count(*) AS n FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w),
        |nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_tok FROM un),
        |pr AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2
        |  FROM tk, LATERAL (SELECT unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i) s),
        |pc AS (SELECT w1, w2, count(*) AS n_pair FROM pr GROUP BY w1, w2 HAVING count(*) >= $LiftMinPair)
        |SELECT pc.w1, pc.w2, pc.n_pair,
        |  (CAST(pc.n_pair AS DOUBLE) * CAST(nt.n_tok AS DOUBLE))
        |    / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS lift
        |FROM pc JOIN un a ON pc.w1 = a.w JOIN un b ON pc.w2 = b.w, nt
        |ORDER BY lift DESC, w1, w2
        |LIMIT $LiftTopK""".stripMargin,
    "q60_token_budget" ->
      s"""WITH t AS (
        |  SELECT source, len(string_split(text, ' ')) AS n_tok,
        |    CASE WHEN ${TextQueries.sampleHashSql} < ${TextQueries.sampleRateBpSql} THEN 1 ELSE 0 END AS kept
        |  FROM documents),
        |per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_tok * kept) AS BIGINT) AS n_tokens_sampled
        |  FROM t GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens_sampled) AS BIGINT) AS tt FROM per)
        |SELECT source, n_docs, n_tokens, n_tokens_sampled,
        |  CAST(n_tokens_sampled AS DOUBLE) / CAST(tt AS DOUBLE) AS share
        |FROM per, tot ORDER BY source""".stripMargin,
  )
}
