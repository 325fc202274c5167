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
    val verts = pairs.select(col("da").as("id"))
      .union(pairs.select(col("db").as("id"))).distinct()
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
    val lbl = graft.ops.Dedup.connectedComponents(verts, edges, track = tracked)
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

  val queries: Map[String, Q] = Map(
    "q57_corpus_funnel" -> q57CorpusFunnel,
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
  )
}
