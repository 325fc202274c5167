package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-on-read JSONL ingest with an error QUARANTINE — the
  * production counterpart of the q57 corpus materializer's JSONL sink:
  * a crawl drop always contains lines that are truncated, invalid
  * JSON, or type-violating, and silently nulling them (Spark's default
  * PERMISSIVE behavior) poisons every downstream aggregate. This
  * reader splits one scan into (parsed, quarantined): parsed rows
  * carry exactly the demanded schema; quarantined rows carry the raw
  * line so the source owner can replay them after a fix — nothing is
  * dropped, nothing half-parsed sneaks through.
  *
  * Scale shape: ONE json scan, split by the corrupt-record marker; the
  * split frames share the scan via the returned cached plan (caller
  * unpersists via the returned handle). At 100 TB the quarantine side
  * is written to its own path and monitored as a rate.
  */
object JsonlIngest {

  /** Result of a quarantine read: `parsed` has the demanded schema,
    * `quarantine` is `(raw)` lines, and `release()` drops the shared
    * scan cache once both sides are consumed.
    */
  final case class QuarantineRead(parsed: DataFrame, quarantine: DataFrame,
      release: () => Unit)

  /** Read `path` as JSONL against `schema`. A line is quarantined when
    * it is not valid JSON, or when any demanded field's type is
    * violated (Spark PERMISSIVE parsing surfaces both through the
    * corrupt-record column). Fields merely MISSING from a valid JSON
    * object parse as null (schema-on-read semantics — absence is data,
    * malformation is an error).
    *
    * The raw frame must be cached before filtering: Spark refuses a
    * query over ONLY the corrupt-record column of a direct json scan
    * (a documented engine restriction), and the cache also makes the
    * two branches share one parse. `track` chooses how the shared scan
    * is retained — default `.cache()` paired with `release()`;
    * oracle-tier queries pass `graft.queries.tracked` so the standard
    * releasePersisted/clearCache hygiene drains it instead.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      track: DataFrame => DataFrame = _.cache()): QuarantineRead = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt), s"schema may not contain $corrupt")
    val raw = track(spark.read
      .schema(schema.add(corrupt, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .json(path))
    val parsed = raw.filter(col(corrupt).isNull).drop(corrupt)
    val quarantine = raw.filter(col(corrupt).isNotNull)
      .select(col(corrupt).as("raw"))
    QuarantineRead(parsed, quarantine, () => { raw.unpersist(false); () })
  }
}
