package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Multimodal-column plumbing: media payloads as opaque `binary` columns
 * with typed metadata, and a partition-batched feature-extraction
 * operator.
 *
 * The IMAGE modality has a real decoder (JDK `javax.imageio` — PNG/
 * JPEG/GIF/BMP, zero external deps): real width/height, mean-pooled
 * grayscale features, and real downscale-and-reencode in
 * [[resizeImages]]. The AUDIO modality has a real decoder too (JDK
 * `javax.sound.sampled` — WAV/AIFF/AU 8/16-bit PCM): real sample rate,
 * channel count, and an 8-window RMS envelope feature. Video/pdf
 * decode is a clearly-marked STUB (no codec libraries in this
 * environment) deriving a deterministic fake feature vector from the
 * payload bytes; [[realDecoders]] is the capability flag. Undecodable
 * payloads fall back to the stub rather than erroring (repo-wide
 * NULL/malformed-input discipline).
 */
object Multimodal {

  /** Which modalities run a REAL decoder vs the deterministic stub. */
  val realDecoders: Map[String, Boolean] = Map(
    "image" -> true, "audio" -> true, "video" -> false,
    "pdf" -> false, "text" -> false)

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
   * Real image decode via `javax.imageio`: returns (width, height,
   * 8-dim mean-pooled-grayscale feature) or None when the payload is
   * not a decodable image. Pixel reads are strided so a pathological
   * 20k x 20k payload costs at most ~64k samples, not 4x10^8.
   */
  private[pipeline] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      // 4x2 grid of mean grayscale in [0,1] — same 8-dim feature shape
      // as the stub so downstream schemas are modality-independent
      val sums = new Array[Double](8)
      val cnts = new Array[Int](8)
      val sx = math.max(1, w / 256)
      val sy = math.max(1, h / 256)
      var y = 0
      while (y < h) {
        val cy = math.min(y * 2 / h, 1)
        var x = 0
        while (x < w) {
          val cell = cy * 4 + math.min(x * 4 / w, 3)
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          sums(cell) += lum / 255.0
          cnts(cell) += 1
          x += sx
        }
        y += sy
      }
      val feat = Array.tabulate(8)(i => if (cnts(i) == 0) 0.0f else (sums(i) / cnts(i)).toFloat)
      Some((w, h, feat))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Minimal PCM WAV writer (8- or 16-bit LE): canonical 44-byte
    * header + sample data. For 8-bit, `data` bytes are UNSIGNED PCM
    * samples; for 16-bit, little-endian signed pairs. Test/harness
    * utility and a cheap deterministic payload generator. */
  def pcmWav(
      data: Array[Byte],
      sampleRate: Int,
      channels: Int = 1,
      bitsPerSample: Int = 8): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16, s"bits=$bitsPerSample")
    require(channels >= 1 && sampleRate >= 1)
    val blockAlign = channels * bitsPerSample / 8
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }

  /**
   * Real audio decode via `javax.sound.sampled` (JDK, zero external
   * deps — WAV/AIFF/AU containers, 8/16-bit PCM): returns
   * (sampleRate, channels, frames, 8-window RMS envelope in [0,1] over
   * the first channel) or None when the payload is not decodable
   * audio. Reads are strided past ~64k frames so a pathological
   * multi-GB payload costs bounded work.
   */
  private[pipeline] def decodeAudio(
      payload: Array[Byte]): Option[(Int, Int, Long, Array[Float])] = {
    if (payload == null || payload.length == 0) return None
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      val bits = fmt.getSampleSizeInBits
      if ((!signed && !unsigned) || (bits != 8 && bits != 16)) return None
      val bytes = in.readAllBytes()
      val blockAlign = fmt.getFrameSize
      if (blockAlign <= 0) return None
      val frames = bytes.length / blockAlign
      if (frames == 0) return None
      val sums = new Array[Double](8)
      val cnts = new Array[Long](8)
      val stride = math.max(1, frames / 65536)
      var f = 0
      while (f < frames) {
        val off = f * blockAlign
        // first channel only: sample value normalized to [-1, 1]
        val v =
          if (bits == 8) {
            val b = bytes(off)
            if (unsigned) ((b & 0xFF) - 128) / 128.0 else b / 128.0
          } else {
            val lo = bytes(off) & 0xFF
            val hi = bytes(off + 1)
            val raw = if (fmt.isBigEndian) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF))
                      else ((hi << 8) | lo)
            val s = if (unsigned) (raw & 0xFFFF) - 32768 else raw
            s / 32768.0
          }
        val win = math.min((f * 8L / frames).toInt, 7)
        sums(win) += v * v
        cnts(win) += 1
        f += stride
      }
      val feat = Array.tabulate(8)(i =>
        if (cnts(i) == 0) 0.0f else math.sqrt(sums(i) / cnts(i)).toFloat)
      Some((fmt.getSampleRate.toInt, fmt.getChannels, frames.toLong, feat))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /**
   * Batch feature extraction over a media Dataset: one decoder
   * instantiation per partition (the shape a real decoder needs —
   * model/codec init amortized across the partition's rows). Image
   * payloads get the real `javax.imageio` path — genuine dimensions
   * and pooled-grayscale features; audio payloads get the real
   * `javax.sound.sampled` path — width/height carry (sampleRate,
   * channels) and the feature is the 8-window RMS envelope; undecodable
   * payloads and the stub-only modalities ([[realDecoders]]) get
   * [[stubDecode]].
   */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // stub modalities: val decoder = Decoder.open(); rows.map(decoder.decode)
      rows.map { r =>
        if (r.modality == "image") {
          decodeImage(r.payload) match {
            case Some((w, h, feat)) =>
              MediaFeatures(r.media_id, r.modality, w, h, feat, r.payload.length.toLong)
            case None => stubDecode(r)
          }
        } else if (r.modality == "audio") {
          decodeAudio(r.payload) match {
            case Some((rate, ch, _, feat)) =>
              MediaFeatures(r.media_id, r.modality, rate, ch, feat, r.payload.length.toLong)
            case None => stubDecode(r)
          }
        } else stubDecode(r)
      }
    }
  }

  /**
   * Real image resize: decode with `javax.imageio`, downscale so
   * max(width, height) <= maxDim preserving aspect ratio, re-encode as
   * PNG. Images already within bounds, undecodable payloads, and
   * non-image modalities pass through untouched (use [[resize]] for
   * the byte-cap fallback on stub modalities). Partition-batched like
   * every media transform here.
   */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.modality != "image") r
        else {
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            if (img == null || math.max(img.getWidth, img.getHeight) <= maxDim) r
            else {
              val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val nw = math.max(1, math.round(img.getWidth * scale).toInt)
              val nh = math.max(1, math.round(img.getHeight * scale).toInt)
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, nw, nh, null)
              } finally g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              r.copy(payload = baos.toByteArray, meta_bytes = baos.size().toLong)
            }
          } catch { case scala.util.control.NonFatal(_) => r }
        }
      }
    }
  }

  case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      payload: Array[Byte],
      frame_bytes: Long)

  /**
   * STUB byte-cap resize for the stub modalities (audio/video/pdf —
   * see [[realDecoders]]; images have the real [[resizeImages]]): a
   * real codec would decode, scale, and re-encode; this one
   * deterministically caps the payload so the partition-batched
   * transform shape — the part that carries over to a real codec — is
   * exercised end to end.
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
