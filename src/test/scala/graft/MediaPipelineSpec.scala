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
}
