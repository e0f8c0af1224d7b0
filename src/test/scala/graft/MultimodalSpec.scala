package graft

import graft.ops.{Frame, MediaRecord, Multimodal}

/** The multimodal plumbing around the stubbed decoder: typed schema,
  * frame sampling/resize shapes, feature determinism, and the
  * executor-side batch path.
  */
class MultimodalSpec extends SparkSpec {

  test("media table: binary payload + typed metadata survive the Dataset hop") {
    val media = Multimodal.mediaTable(spark, sfDir).head(3)
    media.foreach { m =>
      assert(m.media_type == "text/plain")
      assert(m.payload.nonEmpty)
      assert(m.meta.keySet == Set("lang", "source"))
    }
  }

  test("fake decoder: frames tile the payload; resize fixes the shape") {
    val payload = Array.tabulate[Byte](150)(_.toByte)
    val frames = Multimodal.decodeFrames(payload, 64).toSeq
    assert(frames.map(_.length) == Seq(64, 64, 22)) // last frame ragged
    assert(frames.flatten == payload.toSeq)          // lossless tiling
    val resized = Multimodal.resizeFrame(frames.last, 64)
    assert(resized.length == 64)
    assert(resized.take(22).toSeq == frames.last.toSeq) // content kept
    assert(resized.drop(22).forall(_ == 0))             // zero-padded
  }

  test("feature extraction: fixed-width normalized histogram, deterministic") {
    val feats = Multimodal.features(Multimodal.mediaTable(spark, sfDir))
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.histogram.length == 16)
      assert(math.abs(f.histogram.map(_.toDouble).sum - 1.0) < 1e-3,
        "histogram must be L1-normalized")
      assert(f.n_frames == math.ceil(f.n_bytes / 64.0).toInt)
    }
    // determinism across runs
    val again = Multimodal.features(Multimodal.mediaTable(spark, sfDir))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.histogram.toSeq).toSeq == again.map(_.histogram.toSeq).toSeq)
  }

  test("frame sampling: every k-th frame, typed UDTF shape") {
    import spark.implicits._
    val one = Seq(MediaRecord(7L, "video/fake",
      Array.tabulate[Byte](300)(_.toByte), Map.empty)).toDS()
    val frames: Seq[Frame] = Multimodal.sampleFrames(one, frameSize = 64, every = 2)
      .collect().toSeq.sortBy(_.frame_idx)
    // 300 bytes → frames 0..4; sampled: 0, 2, 4
    assert(frames.map(_.frame_idx) == Seq(0, 2, 4))
    assert(frames.forall(_.frame.length == 64))
    assert(frames.forall(_.media_id == 7L))
  }
}
