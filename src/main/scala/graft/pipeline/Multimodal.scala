package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Multimodal-column plumbing: media payloads as opaque `binary` columns
 * with typed metadata, and a partition-batched feature-extraction
 * operator.
 *
 * The actual media decode is a clearly-marked STUB (no image/audio
 * libraries in this environment): it derives a deterministic fake
 * feature vector from the payload bytes. Everything around it — the
 * schema, the Dataset encoding, the mapPartitions batch shape, the
 * partitioning — is real and is what would carry over unchanged when a
 * real decoder is plugged in.
 */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      modality: String,
      payload: Array[Byte],
      meta_bytes: Long,
      meta_source: String)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      width: Int,
      height: Int,
      feature: Array[Float],
      payload_bytes: Long)

  /**
   * STUB decoder: a real implementation would decode the image/audio
   * payload here (e.g. JPEG decode + resize + CNN features). This one
   * derives deterministic pseudo-features from the bytes so the full
   * pipeline is testable end-to-end.
   */
  private[pipeline] def stubDecode(r: MediaRecord): MediaFeatures = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < r.payload.length) {
      h = (h ^ (r.payload(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    val feat = new Array[Float](8)
    var f = 0
    var z = h
    while (f < 8) {
      z = TextFunctions.mix64(z)
      feat(f) = ((z >>> 40).toInt.toFloat / (1 << 24).toFloat) - 0.5f
      f += 1
    }
    MediaFeatures(
      media_id = r.media_id,
      modality = r.modality,
      width = 64 + (TextFunctions.mix64(h) & 0x3FF).toInt,
      height = 64 + (TextFunctions.mix64(h + 1) & 0x3FF).toInt,
      feature = feat,
      payload_bytes = r.payload.length.toLong)
  }

  /**
   * Batch feature extraction over a media Dataset: one decoder
   * instantiation per partition (the shape a real decoder needs —
   * model/codec init amortized across the partition's rows).
   */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val decoder = Decoder.open(); rows.map(decoder.decode)
      rows.map(stubDecode)
    }
  }

  case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      payload: Array[Byte],
      frame_bytes: Long)

  /**
   * STUB resize: a real implementation decodes, scales to target
   * dimensions, and re-encodes; this one deterministically caps the
   * payload (and stamps the target dims through the metadata fields) so
   * the partition-batched transform shape — the part that carries over
   * to a real codec — is exercised end to end.
   */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — init once per partition
      rows.map { r =>
        if (r.payload.length <= maxBytes) r
        else r.copy(payload = r.payload.take(maxBytes),
                    meta_bytes = maxBytes.toLong)
      }
    }
  }

  /**
   * Frame sampling: explode each media payload into every `everyNth`
   * fixed-size frame, at most `maxFrames` per record — the bounded 1→N
   * shape of video frame extraction (a real decoder would seek and
   * decode keyframes; the stub slices byte ranges). Output size is
   * bounded by maxFrames regardless of payload length, so a pathological
   * record cannot blow up a partition.
   */
  def sampleFrames(
      media: Dataset[MediaRecord],
      frameBytes: Int,
      everyNth: Int = 1,
      maxFrames: Int = Int.MaxValue): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && everyNth > 0 && maxFrames > 0,
      "frameBytes, everyNth, and maxFrames must be positive")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by everyNth).take(maxFrames).iterator.map { i =>
          FrameRecord(r.media_id, i,
            java.util.Arrays.copyOfRange(r.payload, i * frameBytes, (i + 1) * frameBytes),
            frameBytes.toLong)
        }
      }
    }
  }

  /** Synthesize a media table from the documents table: payload = UTF-8
    * bytes, modality derived from the lang label (demo wiring only). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val modality = F.when(F.col("lang") === "en", "image")
      .when(F.col("lang") === "de", "audio")
      .when(F.col("lang") === "fr", "video")
      .when(F.col("lang") === "es", "pdf")
      .otherwise("text")
    docs.select(
      F.col("doc_id").as("media_id"),
      modality.as("modality"),
      F.encode(F.col("text"), "UTF-8").as("payload"),
      F.col("n_chars").as("meta_bytes"),
      F.col("source").as("meta_source"))
      .as[MediaRecord]
  }
}
