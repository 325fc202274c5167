package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (project mandate / SURVEY.md §2.11): image/audio/
  * video as opaque `binary` columns with typed metadata, processed in
  * partition-local batches.
  *
  * [[BinaryDecoder]] REALLY parses two public formats with no codec
  * dependencies — uncompressed 24-bit BMP and 16-bit PCM WAV — and falls
  * back to [[StubDecoder]]'s deterministic byte histogram for anything
  * else (this container ships no JPEG/MP3-class codecs). The plumbing —
  * schema, binary payload handling, batched mapPartitions iteration
  * shape, partitioning, output contract — is what a production
  * codec-backed [[MediaDecoder]] drops into unchanged.
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

  /** REAL binary decode for two public formats, no codec dependencies:
    * uncompressed 24-bit BMP (BITMAPINFOHEADER) and 16-bit PCM WAV.
    * Dispatches on magic bytes; payloads that are neither fall back to
    * the histogram stub so mixed corpora still flow through one pass.
    *
    * BMP feature (13 floats): width, height, mean B/G/R (pixel rows are
    * bottom-up and 4-byte padded per the format), then an 8-bin
    * luminance histogram (L1-normalized). WAV feature (6 floats):
    * duration s, RMS, zero-cross rate, peak (amplitudes normalized to
    * [-1, 1]), channels, sample rate in kHz.
    */
  object BinaryDecoder extends MediaDecoder {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | (b(o + 3) << 24)

    def decodeBmp(b: Array[Byte]): Option[Array[Float]] = {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val off = i32(b, 10)
      if (i32(b, 14) < 40) return None // need BITMAPINFOHEADER+
      val w = i32(b, 18)
      val h = i32(b, 22)
      if (u16(b, 28) != 24 || i32(b, 30) != 0 || w <= 0 || h == 0) return None
      val rows = math.abs(h)
      // stride math in Long: a hostile width near Int.MaxValue would wrap
      // w*3+3 negative and slip past the bounds check below
      val strideL = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundaries
      if (off < 0 || off.toLong + strideL * rows > b.length) return None
      val stride = strideL.toInt
      var sumB = 0L; var sumG = 0L; var sumR = 0L
      val hist = new Array[Float](8)
      var r = 0
      while (r < rows) {
        var x = 0
        var p = off + r * stride
        while (x < w) {
          val bl = b(p) & 0xff; val gr = b(p + 1) & 0xff; val rd = b(p + 2) & 0xff
          sumB += bl; sumG += gr; sumR += rd
          // integer Rec.601-ish luminance, bucketed to 8 bins
          hist(((rd * 299 + gr * 587 + bl * 114) / 1000) / 32) += 1f
          x += 1; p += 3
        }
        r += 1
      }
      val n = (w.toLong * rows).toFloat
      Some(Array[Float](w.toFloat, rows.toFloat,
        sumB / n, sumG / n, sumR / n) ++ hist.map(_ / n))
    }

    def decodeWav(b: Array[Byte]): Option[Array[Float]] = {
      if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F'
        || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
      // chunk-walk offsets in Long: a declared chunk length near
      // Int.MaxValue would wrap pos+8+len negative and slip past the
      // bounds check
      var pos = 12L
      var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
        val p = pos.toInt
        val id = new String(b, p, 4, "US-ASCII")
        val len = i32(b, p + 4)
        if (len < 0 || pos + 8 + len.toLong > b.length) return None
        if (id == "fmt " && len >= 16) {
          fmtOk = u16(b, p + 8) == 1 // PCM only
          channels = u16(b, p + 10)
          rate = i32(b, p + 12)
          bits = u16(b, p + 22)
        } else if (id == "data") { dataOff = p + 8; dataLen = len }
        pos += 8L + len + (len & 1) // chunks are word-aligned
      }
      if (!fmtOk || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0) return None
      val n = dataLen / 2
      if (n == 0) return Some(Array[Float](0f, 0f, 0f, 0f, channels.toFloat, rate / 1000f))
      var sumSq = 0.0; var peak = 0f; var crossings = 0; var prevNeg = false
      var i = 0
      while (i < n) {
        val s = ((b(dataOff + 2 * i) & 0xff) | (b(dataOff + 2 * i + 1) << 8)).toShort
        val v = s / 32768f
        sumSq += v.toDouble * v
        if (math.abs(v) > peak) peak = math.abs(v)
        val neg = v < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      val durationSec = n.toFloat / (rate.toFloat * channels)
      Some(Array[Float](durationSec, math.sqrt(sumSq / n).toFloat,
        crossings.toFloat / n, peak, channels.toFloat, rate / 1000f))
    }

    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { b =>
        // one hostile payload must degrade to the stub, never fail the
        // whole Spark task (and its deterministic retries)
        (try decodeBmp(b).orElse(decodeWav(b)) catch { case _: Exception => None })
          .getOrElse(StubDecoder.decodeBatch(Seq(b)).head)
      }

    /** Canonical DECODED content bytes — the container-independent form
      * an exact content-dedup hashes: BMP → pixel triples row-major
      * TOP-DOWN with the 4-byte row padding stripped (a bottom-up and a
      * top-down encoding of the same image canonicalize equal); WAV →
      * the raw PCM `data` chunk alone (extra LIST/INFO chunks and
      * header fields drop out); anything else → the payload itself.
      * Same bounds discipline as the feature decoders; a hostile
      * payload canonicalizes to itself rather than failing the task.
      */
    def contentBytes(b: Array[Byte]): Array[Byte] = {
      def bmp: Option[Array[Byte]] = {
        if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
        val off = i32(b, 10)
        if (i32(b, 14) < 40) return None
        val w = i32(b, 18)
        val h = i32(b, 22)
        if (u16(b, 28) != 24 || i32(b, 30) != 0 || w <= 0 || h == 0) return None
        val rows = math.abs(h)
        val strideL = ((w.toLong * 3 + 3) / 4) * 4
        if (off < 0 || off.toLong + strideL * rows > b.length) return None
        val stride = strideL.toInt
        val rowBytes = w * 3
        val out = new Array[Byte](rowBytes * rows)
        var r = 0
        while (r < rows) {
          // h > 0 stores rows bottom-up; canonical order is top-down
          val srcRow = if (h > 0) rows - 1 - r else r
          System.arraycopy(b, off + srcRow * stride, out, r * rowBytes, rowBytes)
          r += 1
        }
        Some(out)
      }
      def wav: Option[Array[Byte]] = {
        if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F'
          || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
        var pos = 12L
        var dataOff = -1; var dataLen = 0
        while (pos + 8 <= b.length && dataOff < 0) {
          val p = pos.toInt
          val id = new String(b, p, 4, "US-ASCII")
          val len = i32(b, p + 4)
          if (len < 0 || pos + 8 + len.toLong > b.length) return None
          if (id == "data") { dataOff = p + 8; dataLen = len }
          pos += 8L + len + (len & 1)
        }
        if (dataOff < 0) return None
        Some(java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen))
      }
      (try bmp.orElse(wav) catch { case _: Exception => None }).getOrElse(b)
    }
  }

  /** Canonical-content rows for exact multimodal dedup: decode each
    * payload to its container-independent content bytes (partition-
    * parallel, the [[extractFeatures]] iteration shape) and leave the
    * hashing to the caller's plan (`sha2(content, 256)` stays codegen'd
    * — the imperative part is only the decode, as with a real codec).
    */
  def contentRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(col("media_id"))
      .map(r => (r.media_id, r.media_type,
        BinaryDecoder.contentBytes(r.payload)))
      .toDF("media_id", "media_type", "content")
  }

  /** 64-bit bigram-histogram content signature of canonical content
    * bytes, returned as FOUR 16-bit band keys — the q51 banding shape
    * (a single 64-bit value would overflow signed int64 at bit 63 in
    * SQL mirrors). Bucket b ∈ [0, 64) counts the byte BIGRAMS hashing
    * to it (`(prev·31 + cur) mod 64`); bit_b = 1 iff the bucket count
    * exceeds the mean bucket count, evaluated CROSS-MULTIPLIED
    * (`count_b·64 > n_bigrams`) so no division and both engines compare
    * identical integers.
    *
    * Position-INDEPENDENT by construction: for decoded pixels this is a
    * gradient/texture histogram, for audio a sample-transition profile
    * — the perceptual-signature family that survives shifts, crops and
    * container variation. A positional average-hash was measured on
    * this corpus first and rejected: a handful of edits shifts every
    * downstream byte across bucket boundaries, and genuine near-dup
    * payloads landed ≥ 9 bits apart (pure noise); bigram histograms put
    * them at 0–3 bits with a smooth far tail.
    */
  def contentSig4(content: Array[Byte]): Array[Int] = {
    val n = content.length - 1 // bigram count
    val out = new Array[Int](4)
    if (n <= 0) return out
    val cnt = new Array[Long](64)
    var j = 0
    while (j < n) {
      cnt(((content(j) & 0xff) * 31 + (content(j + 1) & 0xff)) % 64) += 1
      j += 1
    }
    var b = 0
    while (b < 64) {
      if (cnt(b) * 64 > n) out(b / 16) |= 1 << (b % 16)
      b += 1
    }
    out
  }

  /** Per-media signature rows `(media_id, a0, a1, a2, a3)`: decode to
    * canonical content, then [[contentSig4]] — the imperative step stays
    * inside the decoder pass, everything after is relational.
    */
  def perceptualRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(col("media_id"))
      .map { r =>
        val a = contentSig4(BinaryDecoder.contentBytes(r.payload))
        (r.media_id, a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong)
      }
      .toDF("media_id", "a0", "a1", "a2", "a3")
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
