package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Opaque binary media record: the multimodal column pattern — payload as
  * `binary`, typed metadata alongside. At 100 TB the payload column is the
  * dominant IO cost; every query below projects it away as early as the
  * semantics allow (column pruning reaches the parquet reader).
  */
case class MediaRecord(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Fixed-shape per-media features produced by the decode stage. */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    n_frames: Int,
    histogram: Array[Float])

/** One sampled, resized "frame" of a media payload. */
case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal column handling (north-star extension: image/audio/video as
  * opaque binary + typed metadata, decode/feature-extract/resize/
  * frame-sample as executor-side batch stages).
  *
  * The container ships no image/audio codecs, so `decodeFrames` is a
  * clearly-marked DETERMINISTIC FAKE (fixed-size byte blocks stand in for
  * decoded frames); everything around it — the typed Dataset schema, the
  * mapPartitions batch shape, partition-parallel execution, frame
  * explosion as flatMap (the UDTF shape), fixed-width feature vectors — is
  * the real plumbing a production codec drops into: replace the body of
  * `decodeFrames`/`resizeFrame` and nothing else changes.
  *
  * The registered query's features are simple enough (byte histogram) that
  * the DuckDB oracle reproduces them from the text stand-in payloads, so
  * even the "decoded" output stays hash-checked.
  */
object Multimodal {

  /** The media table, synthesized deterministically from `documents`
    * (UTF-8 text bytes stand in for an opaque payload; lang/source become
    * the typed metadata).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select(
        $"doc_id".as("media_id"),
        lit("text/plain").as("media_type"),
        $"text".cast("binary").as("payload"),
        map(lit("lang"), $"lang", lit("source"), $"source").as("meta"))
      .as[MediaRecord]
  }

  /** DETERMINISTIC FAKE DECODER — a real build links a codec here.
    * "Decodes" a payload into fixed-size frames (last frame ragged).
    */
  def decodeFrames(payload: Array[Byte], frameSize: Int = 64): Iterator[Array[Byte]] =
    payload.grouped(frameSize)

  /** DETERMINISTIC FAKE RESIZE — truncate/zero-pad to the target size
    * (stands in for a pixel/sample-rate resize; same contract: fixed
    * output shape regardless of input shape).
    */
  def resizeFrame(frame: Array[Byte], target: Int): Array[Byte] =
    if (frame.length == target) frame
    else {
      val out = new Array[Byte](target)
      System.arraycopy(frame, 0, out, 0, math.min(frame.length, target))
      out
    }

  /** Feature extraction over the decoded payload as a typed mapPartitions
    * stage: one executor-side pass per partition batch, fixed-width
    * feature output (16-bin byte histogram, L1-normalized). This is the
    * batch shape a real embedding model consumes — swap the histogram for
    * a model forward pass and the pipeline is unchanged.
    */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { recs =>
      recs.map { r =>
        val counts = new Array[Int](16)
        var i = 0
        while (i < r.payload.length) {
          counts((r.payload(i) & 0xff) >>> 4) += 1
          i += 1
        }
        val n = math.max(r.payload.length, 1)
        MediaFeatures(
          media_id = r.media_id,
          media_type = r.media_type,
          n_bytes = r.payload.length,
          n_frames = decodeFrames(r.payload).length,
          histogram = counts.map(c => (c.toDouble / n).toFloat))
      }
    }
  }

  /** Frame sampling (every k-th decoded frame, resized) as a flatMap —
    * the typed UDTF shape: one input row explodes to a variable number of
    * fixed-shape output rows, executor-side.
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      frameSize: Int = 64,
      every: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeFrames(r.payload, frameSize).zipWithIndex.collect {
        case (f, idx) if idx % every == 0 =>
          Frame(r.media_id, idx, resizeFrame(f, frameSize))
      }
    }
  }

  /** Registered query: the decode→feature stage over the media table.
    * The histogram is recomputed by the oracle from the text payloads
    * (ASCII: byte == code point), so the whole decode path is
    * value-checked, not just row-counted. The histogram ships as a JSON
    * string of the i64-quantized bins (floor(f·1e7)): the driver's pandas
    * compare cannot sort raw array cells, and float rendering differs
    * across engines — both quantize from the identical float bits, so the
    * strings match exactly. The typed Dataset API ([[features]]) still
    * returns real float vectors; only the oracle-facing dump serializes.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    features(mediaTable(spark, dir)).toDF()
      .select($"media_id", $"media_type", $"n_bytes", $"n_frames",
        // unrolled element_at over the fixed 16 bins (transform's lambda
        // is CodegenFallback; see Events.arrayHof)
        to_json(array((1 to 16).map(i =>
          floor(element_at($"histogram", i).cast("double") * lit(1e7))
            .cast("long")): _*)).as("histogram"))
      .orderBy($"media_id")
  }

  val mediaFeaturesSql: String =
    """WITH codes AS (
      |  SELECT doc_id AS media_id, length(text) AS n_bytes,
      |         list_transform(range(length(text)),
      |                        i -> ord(substr(text, CAST(i + 1 AS INT), 1)) // 16) AS bins
      |  FROM documents)
      |SELECT media_id, 'text/plain' AS media_type,
      |       CAST(n_bytes AS INT) AS n_bytes,
      |       CAST(ceil(n_bytes / 64.0) AS INT) AS n_frames,
      |       to_json(list_transform(range(16),
      |         b -> CAST(floor(CAST(CAST(CAST(len(list_filter(bins, x -> x = b)) AS DOUBLE)
      |                   / greatest(n_bytes, 1) AS FLOAT) AS DOUBLE) * 1e7) AS BIGINT))) AS histogram
      |FROM codes
      |ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x13_multimodal_features" -> mediaFeatures _)

  val oracles: Map[String, String] = Map(
    "x13_multimodal_features" -> mediaFeaturesSql)
}
