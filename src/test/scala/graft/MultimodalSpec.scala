package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.ops.Multimodal._

/** Multimodal binary-column plumbing: schema, batching shape, stub
  * decode determinism, resize/frame-sample contracts.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def media = Multimodal.syntheticMedia(
    spark, Tables.documents(spark, "/root/testdata/sf0.001"))

  test("synthetic media carries binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length === 500)
    assert(rows.forall(r => r.payload.nonEmpty))
    assert(rows.map(_.media_type).toSet === Set("image", "audio", "video"))
    assert(rows.forall(r => r.width >= 64 && r.height >= 64))
  }

  test("feature extraction is batched, partition-parallel, deterministic") {
    // decoder that records the batch sizes it was handed (accumulator:
    // the closure is serialized per task, driver-side state won't see it)
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val recording = new MediaDecoder {
      def decodeBatch(ps: Seq[Array[Byte]]): Seq[Array[Float]] = {
        batchSizes.add(ps.length)
        StubDecoder.decodeBatch(ps)
      }
    }
    val feats = Multimodal.extractFeatures(media, recording, batchSize = 8,
      partitions = Some(4)).collect()
    assert(feats.length === 500)
    assert(feats.forall(_.feature.length === 16))
    // histogram is L1-normalized
    assert(feats.forall(f => math.abs(f.feature.sum - 1f) < 1e-3))
    // the decoder saw real batches, none exceeding the configured size
    val sizes = batchSizes.value.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.nonEmpty && sizes.forall(_ <= 8))
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(media, StubDecoder, batchSize = 8).collect()
    assert(again.sortBy(_.media_id).map(_.feature) ===
      feats.sortBy(_.media_id).map(_.feature))
  }

  // ---- real-format fixtures (built byte-by-byte, parsed by BinaryDecoder)

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** 2×2 24-bit BMP: bottom row blue+green, top row red+white, rows
    * padded to 4 bytes (stride 8).
    */
  private def goldenBmp: Array[Byte] = {
    val pixels = Array[Byte](
      // bottom row: blue (B,G,R), green, 2 pad bytes
      255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0,
      // top row: red, white, 2 pad bytes
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte, 0, 0)
    Array[Byte]('B', 'M') ++ le32(54 + pixels.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(pixels.length) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ pixels
  }

  /** Mono 16-bit PCM WAV at 8 kHz: 4 samples alternating ±0.5. */
  private def goldenWav: Array[Byte] = {
    val samples = Seq(16384, -16384, 16384, -16384).flatMap(le16).toArray
    Array[Byte]('R', 'I', 'F', 'F') ++ le32(36 + samples.length) ++
      Array[Byte]('W', 'A', 'V', 'E', 'f', 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
      Array[Byte]('d', 'a', 't', 'a') ++ le32(samples.length) ++ samples
  }

  test("BinaryDecoder parses a real 24-bit BMP: dims, channel means, luminance histogram") {
    val Some(f) = BinaryDecoder.decodeBmp(goldenBmp)
    assert(f.take(5).toSeq === Seq(2f, 2f, 127.5f, 127.5f, 127.5f))
    // luminance bins: blue→0, red→2, green→4, white→7, ¼ each
    assert(f.drop(5).toSeq === Seq(0.25f, 0f, 0.25f, 0f, 0.25f, 0f, 0f, 0.25f))
  }

  test("BinaryDecoder parses real 16-bit PCM WAV: duration, rms, zcr, peak") {
    val Some(f) = BinaryDecoder.decodeWav(goldenWav)
    assert(f.toSeq === Seq(4f / 8000f, 0.5f, 0.75f, 0.5f, 1f, 8f))
  }

  test("mixed corpus: BMP and WAV decode for real, other payloads fall back to stub") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", goldenBmp, 2, 2, 0L),
      MediaRow(2L, "audio", goldenWav, 0, 0, 500L),
      MediaRow(3L, "video", "not media at all".getBytes("US-ASCII"), 0, 0, 0L))
    val ds = spark.createDataset(rows)
    val got = Multimodal.extractFeatures(ds, BinaryDecoder, batchSize = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(got(1L).feature.take(5) === Seq(2f, 2f, 127.5f, 127.5f, 127.5f))
    assert(got(2L).feature === Seq(4f / 8000f, 0.5f, 0.75f, 0.5f, 1f, 8f))
    assert(got(3L).feature.length === 16) // stub histogram shape
    assert(math.abs(got(3L).feature.sum - 1f) < 1e-3)
    // truncated/corrupt headers must not crash the batch
    val junk = Seq(goldenBmp.take(20), goldenWav.take(30), Array.empty[Byte])
    assert(BinaryDecoder.decodeBatch(junk).forall(_.length == 16))
    // hostile declared sizes (Int-overflow stride / chunk length) must
    // degrade to the stub, not walk past the array
    val evilBmp = goldenBmp.clone()
    le32(1073741824).copyToArray(evilBmp, 18) // width 2^30 → stride wraps in Int
    val evilWav = goldenWav.clone()
    le32(0x7ffffff0).copyToArray(evilWav, 40) // data chunk claims ~2 GiB
    assert(BinaryDecoder.decodeBatch(Seq(evilBmp, evilWav)).forall(_.length == 16))
  }

  test("contentBytes canonicalizes decoded content across container variation") {
    // BMP: the same 2×2 image stored bottom-up (golden, h = 2) and
    // top-down (h = -2, rows reordered) must canonicalize equal, with
    // the per-row padding stripped (2·2 pixels × 3 bytes = 12, not the
    // padded 16)
    val bottomUp = goldenBmp
    val topDown = goldenBmp.clone()
    le32(-2).copyToArray(topDown, 22)
    // golden stores bottom row first at offset 54; top-down stores top row first
    System.arraycopy(goldenBmp, 54 + 8, topDown, 54, 8)
    System.arraycopy(goldenBmp, 54, topDown, 54 + 8, 8)
    val cb = BinaryDecoder.contentBytes(bottomUp)
    assert(cb.length == 12)
    assert(cb.toSeq == BinaryDecoder.contentBytes(topDown).toSeq,
      "bottom-up and top-down encodings of the same pixels diverge")
    // WAV: injecting a LIST metadata chunk before `data` must not change
    // the canonical content (the raw PCM samples)
    val samples = goldenWav.takeRight(8)
    val withList = goldenWav.take(36) ++
      Array[Byte]('L', 'I', 'S', 'T') ++ le32(4) ++ Array[Byte]('I', 'N', 'F', 'O') ++
      goldenWav.drop(36)
    assert(BinaryDecoder.contentBytes(goldenWav).toSeq == samples.toSeq)
    assert(BinaryDecoder.contentBytes(withList).toSeq == samples.toSeq,
      "metadata chunk changed the canonical content")
    // opaque payloads canonicalize to themselves
    val opaque = "plain text payload".getBytes("UTF-8")
    assert(BinaryDecoder.contentBytes(opaque) eq opaque)
  }

  test("q73 clusters media by decoded-content hash with min-id keepers") {
    import spark.implicits._
    val out = SparkEntry.queries("q73_multimodal_dedup")(spark, "/root/testdata/sf0.001")
      .selectExpr("media_id", "chash", "cluster_id", "keeper", "csz")
      .as[(Long, String, Long, Int, Long)].collect().toSeq
    graft.queries.releasePersisted()
    assert(out.nonEmpty)
    // keeper is exactly the cluster min, cluster sizes are consistent,
    // and equal hashes share a cluster
    val byCluster = out.groupBy(_._3)
    assert(byCluster.forall { case (cid, ms) =>
      ms.map(_._1).min == cid && ms.count(_._4 == 1) == 1 &&
        ms.forall(_._5 == ms.size) && ms.map(_._2).distinct.size == 1
    })
    spark.catalog.clearCache()
  }

  test("contentSig4 separates near-dup from unrelated content and ignores containers") {
    def dist(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val base = ("the quick brown fox jumps over the lazy dog " * 50).getBytes("UTF-8")
    val edited = ("the quick brown cat jumps over the lazy dog " +
      "the quick brown fox jumps over the lazy dog " * 49).getBytes("UTF-8")
    val unrelated = ("zqxj vwkp mzzr gflb " * 110).getBytes("UTF-8")
    val dNear = dist(Multimodal.contentSig4(base), Multimodal.contentSig4(edited))
    val dFar = dist(Multimodal.contentSig4(base), Multimodal.contentSig4(unrelated))
    assert(dNear <= graft.queries.TextQueries.MediaSigMaxDist,
      s"one-word edit moved the signature $dNear bits — histogram not stable")
    assert(dFar > graft.queries.TextQueries.MediaSigMaxDist,
      s"unrelated content landed $dFar bits away — signature not discriminative")
    // container variation vanishes before the signature: bottom-up and
    // top-down encodings of the same pixels sign identically
    val topDown = goldenBmp.clone()
    le32(-2).copyToArray(topDown, 22)
    System.arraycopy(goldenBmp, 54 + 8, topDown, 54, 8)
    System.arraycopy(goldenBmp, 54, topDown, 54 + 8, 8)
    assert(Multimodal.contentSig4(BinaryDecoder.contentBytes(goldenBmp)).toSeq ==
      Multimodal.contentSig4(BinaryDecoder.contentBytes(topDown)).toSeq)
  }

  test("q74 finds non-vacuous signature pairs within the verify radius") {
    import spark.implicits._
    val out = SparkEntry.queries("q74_media_neardup")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Int)].collect().toSeq
    graft.queries.releasePersisted()
    assert(out.nonEmpty, "no signature pairs at sf0.001 — operator is vacuous")
    assert(out.forall { case (ma, mb, d) =>
      ma < mb && d >= 0 && d <= graft.queries.TextQueries.MediaSigMaxDist })
    spark.catalog.clearCache()
  }

  test("resize falls back to the byte-budget stub for opaque payloads, metadata in sync") {
    val resized = Multimodal.resize(media, 128, 128).collect()
    val budget = 128 * 128 / 64 + 1
    assert(resized.forall(r => r.payload.length === budget))
    assert(resized.forall(r => r.width === 128 && r.height === 128))
  }

  test("resizeBmp really resamples: round-trips, nearest-neighbor pixels, orientation-blind") {
    // 2×2 → 4×4: every source pixel duplicates into a 2×2 block
    val Some(up) = BinaryDecoder.resizeBmp(goldenBmp, 4, 4)
    val Some(f) = BinaryDecoder.decodeBmp(up)
    assert(f.take(5).toSeq === Seq(4f, 4f, 127.5f, 127.5f, 127.5f),
      "upscale must preserve dims and channel means exactly")
    val px = BinaryDecoder.contentBytes(up).grouped(3).map(_.toSeq).toSeq
    assert(px.length === 16)
    val red = Seq[Byte](0, 0, 255.toByte); val white = Seq[Byte](255.toByte, 255.toByte, 255.toByte)
    val blue = Seq[Byte](255.toByte, 0, 0); val green = Seq[Byte](0, 255.toByte, 0)
    // canonical top-down rows: 2× (red red white white), 2× (blue blue green green)
    assert(px === Seq(red, red, white, white, red, red, white, white,
      blue, blue, green, green, blue, blue, green, green))
    // 2×2 → 1×1 keeps the canonical top-left pixel (red)
    val Some(one) = BinaryDecoder.resizeBmp(goldenBmp, 1, 1)
    assert(BinaryDecoder.contentBytes(one).toSeq === red)
    // bottom-up and top-down encodings of the same image resize identically
    val topDown = goldenBmp.clone()
    le32(-2).copyToArray(topDown, 22)
    System.arraycopy(goldenBmp, 54 + 8, topDown, 54, 8)
    System.arraycopy(goldenBmp, 54, topDown, 54 + 8, 8)
    val Some(up2) = BinaryDecoder.resizeBmp(topDown, 4, 4)
    assert(up.toSeq === up2.toSeq, "resize must be container-orientation blind")
    // non-BMP payloads are refused, not mangled
    assert(BinaryDecoder.resizeBmp(goldenWav, 4, 4).isEmpty)
    assert(BinaryDecoder.resizeBmp("text".getBytes, 4, 4).isEmpty)
    // hostile height Int.MinValue: math.abs stays negative and would slip
    // past the stride bounds check — every BMP parser must refuse it
    val evilH = goldenBmp.clone()
    le32(Int.MinValue).copyToArray(evilH, 22)
    assert(BinaryDecoder.resizeBmp(evilH, 4, 4).isEmpty)
    assert(BinaryDecoder.decodeBmp(evilH).isEmpty)
    assert(BinaryDecoder.contentBytes(evilH) eq evilH, "canonicalizes to itself")
  }

  test("decimateWav keeps every stride-th frame and re-encodes a valid lower-rate WAV") {
    val Some(out) = BinaryDecoder.decimateWav(goldenWav, 2)
    // golden: 4 mono frames (±0.5 alternating) at 8 kHz → frames 0 and 2
    // (both +0.5) at 4 kHz: duration preserved, zero crossings gone
    val Some(f) = BinaryDecoder.decodeWav(out)
    assert(f.toSeq === Seq(2f / 4000f, 0.5f, 0f, 0.5f, 1f, 4f))
    assert(BinaryDecoder.contentBytes(out).toSeq ===
      Seq[Byte](0, 64, 0, 64), "kept PCM must be frames 0 and 2 (+16384 each)")
    // stride beyond the sample rate refused; opaque payloads refused
    assert(BinaryDecoder.decimateWav(goldenWav, 9000).isEmpty)
    assert(BinaryDecoder.decimateWav("text".getBytes, 2).isEmpty)
  }

  test("frame sampling: real PCM frames for WAV, chunk stub for opaque video, none for images") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "audio", goldenWav, 0, 0, 500L),
      MediaRow(2L, "video", ("x" * 40).getBytes("US-ASCII"), 0, 0, 0L),
      MediaRow(3L, "image", goldenBmp, 2, 2, 0L))
    val frames = Multimodal.frameSample(spark.createDataset(rows), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    val wav = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(wav.map(_._2).toSeq === Seq(0, 2), "every 2nd PCM frame")
    assert(wav.forall(_._3.toSeq === Seq[Byte](0, 64)), "frames 0/2 are +16384")
    val vid = frames.filter(_._1 == 2L).sortBy(_._2)
    assert(vid.map(_._2).toSeq === Seq(0, 2), "40 bytes → chunks 0..2, strided")
    assert(vid.map(_._3.length).toSeq === Seq(16, 8), "full chunk then the 8-byte tail")
    assert(!frames.exists(_._1 == 3L), "images don't frame-sample")
    // synthetic corpus (opaque text payloads): only videos emit frames
    val synth = Multimodal.frameSample(media, stride = 2).collect()
    assert(synth.nonEmpty)
    val vids = media.filter(_.media_type == "video").collect().map(_.media_id).toSet
    assert(synth.map(_.getLong(0)).toSet.subsetOf(vids))
    assert(synth.forall(_.getInt(1) % 2 === 0))
  }
}
