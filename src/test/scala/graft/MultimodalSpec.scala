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

  test("resize stub pads/truncates payloads and rewrites metadata") {
    val resized = Multimodal.resizeStub(media, 128, 128).collect()
    val budget = 128 * 128 / 64 + 1
    assert(resized.forall(r => r.payload.length === budget))
    assert(resized.forall(r => r.width === 128 && r.height === 128))
  }

  test("frame sampling emits every stride-th chunk for videos only") {
    val frames = Multimodal.frameSample(media, stride = 2).collect()
    assert(frames.nonEmpty)
    val vids = media.filter(_.media_type == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.getLong(0)).toSet.subsetOf(vids))
    assert(frames.forall(_.getInt(1) % 2 === 0))
  }
}
