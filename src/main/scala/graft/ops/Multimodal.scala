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
      if (rows <= 0) return None // h = Int.MinValue: abs stays negative
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

    def decodeWav(b: Array[Byte]): Option[Array[Float]] =
      wavPcm(b).map { case (channels, rate, dataOff, dataLen) =>
        val n = dataLen / 2
        if (n == 0) Array[Float](0f, 0f, 0f, 0f, channels.toFloat, rate / 1000f)
        else {
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
          Array[Float](durationSec, math.sqrt(sumSq / n).toFloat,
            crossings.toFloat / n, peak, channels.toFloat, rate / 1000f)
        }
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
        if (rows <= 0) return None // h = Int.MinValue: abs stays negative
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

    private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }

    /** WAV fmt+data locator shared by [[decodeWav]] and the transforms
      * below: PCM 16-bit only; chunk-walk offsets in Long because a
      * declared chunk length near Int.MaxValue would wrap pos+8+len
      * negative and slip past the bounds check.
      * Returns (channels, sampleRate, dataOff, dataLen).
      */
    private def wavPcm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F'
        || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
      var pos = 12L
      var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
      var dataOff = -1; var dataLen = 0
      while (pos + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
        val p = pos.toInt
        val id = new String(b, p, 4, "US-ASCII")
        val len = i32(b, p + 4)
        if (len < 0 || pos + 8 + len.toLong > b.length) return None
        if (id == "fmt " && len >= 16) {
          fmtOk = u16(b, p + 8) == 1
          channels = u16(b, p + 10)
          rate = i32(b, p + 12)
          bits = u16(b, p + 22)
        } else if (id == "data") { dataOff = p + 8; dataLen = len }
        pos += 8L + len + (len & 1)
      }
      if (!fmtOk || bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0) None
      else Some((channels, rate, dataOff, dataLen))
    }

    /** REAL image resize for the format we really parse: nearest-neighbor
      * resample of a 24-bit BMP to `tw`×`th`, re-encoded as a valid
      * bottom-up 24-bit BMP (54-byte header, 4-byte-padded rows) that
      * [[decodeBmp]]/[[contentBytes]] round-trip. Sampling runs in
      * canonical top-down coordinates — src row = y·rows/th, src col =
      * x·w/tw, integer floors — so bottom-up and top-down encodings of
      * the same image resize to the identical output. Same hostile-input
      * bounds discipline as the decoders; None means "not a BMP I can
      * resize", never a thrown task.
      */
    def resizeBmp(b: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
      if (tw <= 0 || th <= 0 || tw > (1 << 14) || th > (1 << 14)) return None
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val off = i32(b, 10)
      if (i32(b, 14) < 40) return None
      val w = i32(b, 18)
      val h = i32(b, 22)
      if (u16(b, 28) != 24 || i32(b, 30) != 0 || w <= 0 || h == 0) return None
      val rows = math.abs(h)
      if (rows <= 0) return None // h = Int.MinValue: abs stays negative
      val strideL = ((w.toLong * 3 + 3) / 4) * 4
      if (off < 0 || off.toLong + strideL * rows > b.length) return None
      val stride = strideL.toInt
      val outStride = ((tw * 3 + 3) / 4) * 4
      val out = new Array[Byte](54 + outStride * th)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length); putI32(out, 10, 54); putI32(out, 14, 40)
      putI32(out, 18, tw); putI32(out, 22, th) // h > 0: bottom-up storage
      putU16(out, 26, 1); putU16(out, 28, 24); putI32(out, 30, 0)
      putI32(out, 34, outStride * th)
      putI32(out, 38, 2835); putI32(out, 42, 2835)
      var y = 0
      while (y < th) { // y in top-down canonical space
        val srcYtd = ((y.toLong * rows) / th).toInt
        val srcRow = if (h > 0) rows - 1 - srcYtd else srcYtd
        val dstRow = th - 1 - y
        var x = 0
        while (x < tw) {
          val srcX = ((x.toLong * w) / tw).toInt
          val sp = off + srcRow * stride + srcX * 3
          val dp = 54 + dstRow * outStride + x * 3
          out(dp) = b(sp); out(dp + 1) = b(sp + 1); out(dp + 2) = b(sp + 2)
          x += 1
        }
        y += 1
      }
      Some(out)
    }

    /** REAL audio frame-sampling for the format we really parse: keep
      * every `stride`-th PCM frame (one frame = one 16-bit sample per
      * channel) of a PCM WAV and re-encode a valid 44-byte-header WAV at
      * sampleRate/stride — duration is preserved, resolution drops, and
      * [[decodeWav]] round-trips the output. None = not decimatable PCM.
      */
    def decimateWav(b: Array[Byte], stride: Int): Option[Array[Byte]] = {
      if (stride <= 0) return None
      wavPcm(b).filter(_._2 / stride >= 1).map { case (channels, rate, dataOff, dataLen) =>
        val blockAlign = channels * 2
        val nFrames = dataLen / blockAlign
        val outFrames = (nFrames + stride - 1) / stride
        val outLen = outFrames * blockAlign
        val out = new Array[Byte](44 + outLen)
        out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
        putI32(out, 4, 36 + outLen)
        out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
        out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
        putI32(out, 16, 16); putU16(out, 20, 1); putU16(out, 22, channels)
        val newRate = rate / stride
        putI32(out, 24, newRate); putI32(out, 28, newRate * blockAlign)
        putU16(out, 32, blockAlign); putU16(out, 34, 16)
        out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
        putI32(out, 40, outLen)
        var f = 0
        while (f < outFrames) {
          System.arraycopy(b, dataOff + f * stride * blockAlign,
            out, 44 + f * blockAlign, blockAlign)
          f += 1
        }
        out
      }
    }

    /** PCM frames of a WAV as (blockAlign-byte) slices — the frame
      * iterator [[Multimodal.frameSample]] samples from. None = opaque.
      */
    def pcmFrameInfo(b: Array[Byte]): Option[(Int, Int, Int)] =
      (try wavPcm(b) catch { case _: Exception => None })
        .map { case (ch, _, off, len) => (off, len / (ch * 2), ch * 2) }
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

  /** Per-media signature rows `(media_id, n_content, a0, a1, a2, a3)`:
    * decode to canonical content, then [[contentSig4]] — the imperative
    * step stays inside the decoder pass, everything after is
    * relational. `n_content` rides along so callers can exclude
    * sub-bigram content (< 2 bytes → the all-zero signature, which
    * would otherwise pair every empty payload with every other at
    * distance 0).
    */
  def perceptualRows(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(col("media_id"))
      .map { r =>
        val c = BinaryDecoder.contentBytes(r.payload)
        val a = contentSig4(c)
        (r.media_id, c.length.toLong,
          a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong)
      }
      .toDF("media_id", "n_content", "a0", "a1", "a2", "a3")
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

  /** Resize: REAL decode → nearest-neighbor scale → re-encode for the
    * format we really parse ([[BinaryDecoder.resizeBmp]] — the output is
    * a valid BMP the decoders round-trip); payloads that aren't
    * resizable BMPs take the deterministic byte-budget stub (truncate/
    * zero-pad — the stand-in for codecs this container doesn't ship).
    * Metadata stays in sync either way. Partition-parallel map — the
    * per-row transform shape a 100 TB decode pass wants.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      // one hostile payload must fall to the stub, never fail the task —
      // the decodeBatch discipline
      val p = (try BinaryDecoder.resizeBmp(r.payload, targetW, targetH)
        catch { case _: Exception => None }).getOrElse {
        val budget = targetW * targetH / 64 + 1
        r.payload.take(budget).padTo(budget, 0.toByte)
      }
      r.copy(payload = p, width = targetW, height = targetH)
    }
  }

  /** Frame sampling, one row per kept frame `(media_id, frame_idx,
    * frame)`: REAL for the format we really parse — a PCM WAV's frames
    * (one 16-bit sample per channel; [[BinaryDecoder.pcmFrameInfo]])
    * sampled every `stride`-th — while opaque video payloads take the
    * 16-byte-chunk stub (no public video codec ships in this container)
    * and images are skipped (nothing to frame-sample). The companion
    * whole-payload form is [[BinaryDecoder.decimateWav]], which
    * re-encodes the kept frames as a valid lower-rate WAV.
    */
  def frameSample(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      BinaryDecoder.pcmFrameInfo(r.payload) match {
        case Some((off, nFrames, blockAlign)) =>
          (0 until nFrames by stride).map { idx =>
            (r.media_id, idx, java.util.Arrays.copyOfRange(
              r.payload, off + idx * blockAlign, off + (idx + 1) * blockAlign))
          }
        case None if r.media_type == "video" =>
          r.payload.grouped(16).zipWithIndex.collect {
            case (chunk, idx) if idx % stride == 0 => (r.media_id, idx, chunk)
          }.toSeq
        case None => Nil
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
