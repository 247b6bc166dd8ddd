package graft

import graft.multimodal._
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multimodal decode pipeline: schema, determinism, batch shape") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val feats = MediaPipeline.extractFeatures(items)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { f =>
      assert(f.features.length == 16, "fixed-width feature vector")
      assert(math.abs(f.features.sum - 1.0) < 1e-9,
        "normalized histogram (deterministic stub decode)")
      assert(f.n_bytes > 0)
    }
    // determinism: same payload → same features
    val again = MediaPipeline.extractFeatures(items).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    rows.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("decode stub handles empty payload") {
    assert(MediaPipeline.fakeDecode(Array.emptyByteArray).sum == 0.0)
  }

  test("resize stage shrinks payloads by the factor, keeps ids/mime") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val before = items.collect().map(m => m.media_id -> m.payload.length).toMap
    val after = MediaPipeline.resize(items, factor = 2).collect()
    assert(after.length == before.size)
    after.foreach { m =>
      val n = before(m.media_id)
      assert(m.payload.length == (n + 1) / 2,
        s"resize factor 2: expected ${(n + 1) / 2} bytes, got ${m.payload.length}")
      assert(m.mime == "text/plain")
    }
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val nBytes = items.collect().map(m => m.media_id -> m.payload.length).toMap
    val frames = MediaPipeline.sampleFrames(items, frameBytes = 64, stride = 4)
      .collect()
    val byDoc = frames.groupBy(_.media_id)
    byDoc.foreach { case (id, fs) =>
      val totalFrames = (nBytes(id) + 63) / 64
      val expected = (totalFrames + 3) / 4
      assert(fs.length == expected,
        s"doc $id: expected $expected sampled frames, got ${fs.length}")
      assert(fs.forall(f => f.frame_no % 4 == 0), "only stride-aligned frames")
      assert(fs.filter(_.frame_no + 4 <= totalFrames - 1)
        .forall(_.frame.length == 64), "interior frames are fixed-size")
    }
  }
}
