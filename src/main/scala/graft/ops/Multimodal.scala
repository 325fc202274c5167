package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (project mandate / SURVEY.md §2.11): image/audio/
  * video as opaque `binary` columns with typed metadata, processed in
  * partition-local batches.
  *
  * The *decode* step is a STUB — this container has no image/audio
  * codecs, so [[StubDecoder]] produces a deterministic fake feature
  * vector (a normalized byte histogram). Everything around it — the
  * schema, the binary payload handling, the batched mapPartitions
  * iteration shape, the partitioning, the output contract — is real
  * Spark plumbing a production decoder would drop into (swap
  * [[MediaDecoder]] for one that calls an actual codec).
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  case class FeatureRow(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      feature: Seq[Float])

  /** Batch-shaped decoder contract: receives up to `batchSize` payloads
    * at once (the shape a vectorized/NN decoder wants), returns one
    * feature vector per payload, in order.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** STUB decode: 16-bin byte histogram, L1-normalized. Deterministic,
    * dependency-free; stands in for a real image/audio decode.
    */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val hist = new Array[Float](16)
        bytes.foreach(b => hist((b & 0xff) / 16) += 1f)
        val total = math.max(bytes.length, 1).toFloat
        hist.map(_ / total)
      }
  }

  /** Synthesize deterministic opaque payloads from the documents table —
    * the fixture stand-in for real media files.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (lit(64) + pmod(col("doc_id") * 31, lit(512)).cast("int")).as("width"),
      (lit(64) + pmod(col("doc_id") * 17, lit(512)).cast("int")).as("height"),
      pmod(col("doc_id") * 977, lit(60000)).as("duration_ms"))
      .as[MediaRow]
  }

  /** Feature extraction: partition-parallel, batched through the decoder
    * (`grouped(batchSize)` inside mapPartitions is the Scala analog of a
    * pandas-batched UDF). Repartitions by media_id so a 100 TB corpus
    * spreads decode work evenly regardless of upstream layout.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder,
      batchSize: Int = 64,
      partitions: Option[Int] = None): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    val repart = partitions.fold(media.repartition(col("media_id")))(
      n => media.repartition(n, col("media_id")))
    repart.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = decoder.decodeBatch(batch.map(_.payload))
        batch.lazyZip(feats).map { (row, f) =>
          FeatureRow(row.media_id, row.media_type, row.payload.length, f.toSeq)
        }
      }
    }
  }

  /** "Resize" stub for images: truncate/zero-pad the payload to the target
    * byte budget (real impl: decode → scale → re-encode). Keeps the
    * metadata columns in sync.
    */
  def resizeStub(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val budget = targetW * targetH / 64 + 1
      val p = r.payload.take(budget).padTo(budget, 0.toByte)
      r.copy(payload = p, width = targetW, height = targetH)
    }
  }

  /** Frame-sampling stub for videos: every `stride`-th 16-byte chunk of
    * the payload becomes one "frame" row (media_id, frame_idx, frame).
    */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      r.payload.grouped(16).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => (r.media_id, idx, chunk)
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
