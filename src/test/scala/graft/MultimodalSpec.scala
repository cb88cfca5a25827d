package graft

import graft.sources.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val media = Multimodal.fromBytes(spark, Seq(
    (1L, "image", Array[Byte](1, 2, 3), Map("w" -> "64", "h" -> "64")),
    (2L, "audio", Array[Byte](4, 5), Map("sr" -> "16000")),
    (3L, "video", Array[Byte](6), Map("n_frames" -> "10")),
    (4L, "image", null, Map.empty[String, String])))

  test("media table has the canonical schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "modality", "bytes", "meta"))
    assert(media.count() == 4)
  }

  test("feature extraction: fixed dim, deterministic, null bytes → null") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](2))).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](2))).toMap
    assert(f1 == f2)
    assert(f1(1L).get.size == 8)
    assert(f1(4L).isEmpty)
    assert(f1(1L) != f1(2L))
  }

  test("frame sampling: every-Nth frames for video, single row otherwise") {
    val frames = Multimodal.sampleFrames(media, everyNth = 3, dim = 4)
      .collect().groupBy(_.getLong(0))
    assert(frames(3L).map(_.getInt(1)).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames(1L).map(_.getInt(1)).toSeq == Seq(0))
    // per-frame features differ (frame index is part of the stub decode)
    val fv = frames(3L).map(_.getSeq[Float](2)).toSeq
    assert(fv.distinct.size == fv.size)
  }
}
