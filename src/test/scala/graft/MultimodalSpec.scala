package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.BinaryType

import graft.ops.{Frame, MediaRecord, Multimodal}

/** The multimodal plumbing around the stubbed codec: the PERSISTED
  * binary fixture (round 17 — a real parquet BYTE_ARRAY column under
  * target/media_store, fingerprint-keyed + atomically renamed like the
  * X179 artifacts), the header parse, typed schema, frame
  * sampling/resize shapes, feature determinism, and the executor-side
  * batch path.
  */
class MultimodalSpec extends SparkSpec {

  test("media fixture: persisted parquet with a REAL binary payload " +
    "column; reload parses back every header field") {
    val root = Multimodal.ensureMediaRoot(spark, sfDir)
    assert(Files.exists(Paths.get(root)))
    // the on-disk schema carries a genuine binary column
    val onDisk = spark.read.parquet(root)
    assert(onDisk.schema("payload").dataType == BinaryType)
    // no .tmp leftovers from the atomic ensure
    val parent = Paths.get(root).getParent
    assert(!Files.list(parent).iterator().asScala
      .exists(_.getFileName.toString.contains(".tmp-")),
      "media fixture ensure leaked a temp directory")
    // header fields survive persist → reload → parse
    val media = Multimodal.mediaTable(spark, sfDir).head(5)
    media.foreach { m =>
      val h = Multimodal.parseHeader(m.payload)
      assert(h.mediaType == m.media_type,
        "header type must agree with the typed metadata column")
      assert(h.width == 1 + (m.media_id % 26).toInt)
      assert(h.height == 1 + (m.media_id % 22).toInt)
      assert(m.meta.keySet == Set("lang", "source"))
    }
    assert(media.map(_.media_type).toSet.subsetOf(
      Set("image/fake", "audio/fake", "video/fake")))
  }

  test("header parse fails loudly on a corrupt or foreign payload") {
    intercept[IllegalArgumentException] {
      Multimodal.parseHeader("JPEG....junk".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseHeader(Array[Byte](71, 82)) // truncated
    }
    intercept[IllegalArgumentException] {
      // good magic, type digit out of range
      Multimodal.parseHeader("GRFT19Aa-body".getBytes("UTF-8"))
    }
  }

  test("fake decoder: frames tile the body; resize fixes the shape") {
    val body = Array.tabulate[Byte](150)(_.toByte)
    val frames = Multimodal.decodeFrames(body, 64).toSeq
    assert(frames.map(_.length) == Seq(64, 64, 22)) // last frame ragged
    assert(frames.flatten == body.toSeq)            // lossless tiling
    val resized = Multimodal.resizeFrame(frames.last, 64)
    assert(resized.length == 64)
    assert(resized.take(22).toSeq == frames.last.toSeq) // content kept
    assert(resized.drop(22).forall(_ == 0))             // zero-padded
  }

  test("feature extraction: fixed-width normalized histogram over the " +
    "body, deterministic") {
    val feats = Multimodal.features(Multimodal.mediaTable(spark, sfDir))
      .collect().sortBy(_.media_id)
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.histogram.length == 16)
      assert(math.abs(f.histogram.map(_.toDouble).sum - 1.0) < 1e-3,
        "histogram must be L1-normalized")
      assert(f.n_frames ==
        math.ceil((f.n_bytes - Multimodal.HeaderLen) / 64.0).toInt)
      assert(f.width >= 1 && f.width <= 26 && f.height >= 1 && f.height <= 22)
    }
    // determinism across runs
    val again = Multimodal.features(Multimodal.mediaTable(spark, sfDir))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.histogram.toSeq).toSeq == again.map(_.histogram.toSeq).toSeq)
  }

  test("frame sampling: every k-th frame, typed UDTF shape") {
    import spark.implicits._
    // 8-byte header + 300-byte body
    val payload = ("GRFT10Aa".getBytes("UTF-8") ++
      Array.tabulate[Byte](300)(_.toByte))
    val one = Seq(MediaRecord(7L, "image/fake", payload, Map.empty)).toDS()
    val frames: Seq[Frame] = Multimodal.sampleFrames(one, frameSize = 64, every = 2)
      .collect().toSeq.sortBy(_.frame_idx)
    // 300 body bytes → frames 0..4; sampled: 0, 2, 4
    assert(frames.map(_.frame_idx) == Seq(0, 2, 4))
    assert(frames.forall(_.frame.length == 64))
    assert(frames.forall(_.media_id == 7L))
  }
}
