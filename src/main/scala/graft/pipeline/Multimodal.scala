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
 * channel count, and an 8-window RMS envelope feature. The VIDEO
 * modality has a real CONTAINER decoder: a pure-JVM RIFF/AVI parser
 * (public AVI spec) extracting MJPG keyframes decoded with
 * `javax.imageio` — real dimensions, frame count, and an 8-slot
 * temporal luminance envelope; inter-frame codecs (H.264 etc.) need
 * codec libraries this environment lacks and fall back to the stub.
 * The PDF modality has a real decoder too: a pure-JVM parser of the
 * public PDF spec subset covering uncompressed and /FlateDecode
 * (`java.util.zip`) content streams with Tj/TJ/'/" text-showing
 * operators — real page counts and byte-exact text extraction for
 * that subset (hex strings and exotic font encodings are out of
 * scope). Only bare "text" retains the deterministic stub;
 * [[realDecoders]] is the capability flag. Undecodable payloads fall
 * back to the stub rather than erroring (repo-wide
 * NULL/malformed-input discipline).
 */
object Multimodal {

  /** Which modalities run a REAL decoder vs the deterministic stub.
    * Video = MJPEG-in-AVI container parsing + JPEG keyframe decode;
    * pdf = uncompressed//FlateDecode Tj/TJ text + page count. */
  val realDecoders: Map[String, Boolean] = Map(
    "image" -> true, "audio" -> true, "video" -> true,
    "pdf" -> true, "text" -> false)

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

  // ------------------------------------------------------------- video

  private def writeIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }
  private def writeShortLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
  }
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /**
   * Minimal MJPEG-in-AVI writer (public AVI RIFF layout: `hdrl` with
   * `avih` + one `vids/MJPG` stream, `movi` with one `00dc` chunk per
   * JPEG frame, chunks word-aligned). Enough container for any
   * MJPEG-capable player and for [[decodeVideo]]; test/harness utility
   * and deterministic payload generator.
   */
  def mjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "mjpegAvi needs at least one frame")
    require(width > 0 && height > 0 && fps > 0)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(fcc(id)); writeIntLE(out, data.length); out.write(data)
      if (data.length % 2 == 1) out.write(0)
      out.toByteArray
    }
    def list(kind: String, inner: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(fcc("LIST")); writeIntLE(out, inner.length + 4)
      out.write(fcc(kind)); out.write(inner)
      out.toByteArray
    }
    val avih = new java.io.ByteArrayOutputStream()
    writeIntLE(avih, 1000000 / fps); writeIntLE(avih, 0); writeIntLE(avih, 0)
    writeIntLE(avih, 0); writeIntLE(avih, frames.length); writeIntLE(avih, 0)
    writeIntLE(avih, 1); writeIntLE(avih, 0)
    writeIntLE(avih, width); writeIntLE(avih, height)
    (0 until 4).foreach(_ => writeIntLE(avih, 0))
    val strh = new java.io.ByteArrayOutputStream()
    strh.write(fcc("vids")); strh.write(fcc("MJPG"))
    writeIntLE(strh, 0); writeIntLE(strh, 0); writeIntLE(strh, 0)
    writeIntLE(strh, 1); writeIntLE(strh, fps)           // scale, rate
    writeIntLE(strh, 0); writeIntLE(strh, frames.length) // start, length
    writeIntLE(strh, 0); writeIntLE(strh, 0); writeIntLE(strh, 0)
    writeShortLE(strh, 0); writeShortLE(strh, 0)
    writeShortLE(strh, width); writeShortLE(strh, height)
    val strf = new java.io.ByteArrayOutputStream()     // BITMAPINFOHEADER
    writeIntLE(strf, 40); writeIntLE(strf, width); writeIntLE(strf, height)
    writeShortLE(strf, 1); writeShortLE(strf, 24); strf.write(fcc("MJPG"))
    writeIntLE(strf, width * height * 3)
    (0 until 4).foreach(_ => writeIntLE(strf, 0))
    val hdrl = list("hdrl",
      chunk("avih", avih.toByteArray) ++
        list("strl", chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray)))
    val movi = list("movi",
      frames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = fcc("AVI ") ++ hdrl ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write(fcc("RIFF")); writeIntLE(out, body.length); out.write(body)
    out.toByteArray
  }

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse an AVI container: (width, height, frame (offset, length)
    * list for the `..dc`/`..db` video chunks under `movi`). None on
    * anything that is not well-formed AVI. */
  private[pipeline] def parseAvi(b: Array[Byte]): Option[(Int, Int, Vector[(Int, Int)])] = {
    if (b == null || b.length < 24) return None
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    try {
      var w = -1
      var h = -1
      val frames = Vector.newBuilder[(Int, Int)]
      def walk(from: Int, to: Int): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourcc(b, off)
          val size = readIntLE(b, off + 4)
          // long math: a crafted size near Int.MaxValue overflows the
          // int sum negative and would sneak past the bounds check
          if (size < 0 || off + 8L + size > to) return
          if (id == "LIST" && size >= 4) {
            walk(off + 12, off + 8 + size)   // descend past the list type
          } else if (id == "avih" && size >= 40) {
            w = readIntLE(b, off + 8 + 32)
            h = readIntLE(b, off + 8 + 36)
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db")) && size > 0) {
            frames += ((off + 8, size))
          }
          off += 8 + size + (size & 1)       // chunks are word-aligned
        }
      }
      walk(12, math.min(b.length, 8 + readIntLE(b, 4)))
      val fs = frames.result()
      if (w <= 0 || h <= 0 || fs.isEmpty) None else Some((w, h, fs))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Strided mean luminance of a decoded frame in [0, 1]. */
  private def meanLuminance(img: java.awt.image.BufferedImage): Float = {
    val w = img.getWidth
    val h = img.getHeight
    val sx = math.max(1, w / 64)
    val sy = math.max(1, h / 64)
    var sum = 0.0
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 255000.0
        n += 1
        x += sx
      }
      y += sy
    }
    if (n == 0) 0.0f else (sum / n).toFloat
  }

  /**
   * Real video decode for MJPEG-in-AVI: container dimensions, frame
   * count, and an 8-slot temporal envelope (mean luminance of up to 8
   * evenly spaced keyframes, each decoded with `javax.imageio`). None
   * when the payload is not AVI or no frame decodes — inter-frame
   * codecs fall back to the stub, documented in [[realDecoders]].
   */
  private[pipeline] def decodeVideo(
      payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    parseAvi(payload).flatMap { case (w, h, frames) =>
      val n = frames.length
      val slots = math.min(8, n)
      val feat = new Array[Float](8)
      var decoded = 0
      var i = 0
      while (i < slots) {
        val fi = if (slots == 1) 0 else (i.toLong * (n - 1) / (slots - 1)).toInt
        val (off, len) = frames(fi)
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(payload, off, off + len)))
          if (img != null) { feat(i) = meanLuminance(img); decoded += 1 }
        } catch { case scala.util.control.NonFatal(_) => () }
        i += 1
      }
      if (decoded == 0) None else Some((w, h, n, feat))
    }
  }

  /**
   * Real keyframe extraction: explode each AVI payload into its MJPEG
   * keyframes (every `everyNth`, at most `maxFrames` — bounded 1→N
   * like [[sampleFrames]]), each an independently decodable JPEG.
   * Non-AVI/undecodable payloads contribute no rows. Partition-batched
   * map-only transform; at 100 TB the frame table is written once and
   * every downstream vision op reads frames, never videos.
   */
  def sampleKeyframes(
      media: Dataset[MediaRecord],
      everyNth: Int = 1,
      maxFrames: Int = Int.MaxValue): Dataset[FrameRecord] = {
    import media.sparkSession.implicits._
    require(everyNth > 0 && maxFrames > 0, "everyNth and maxFrames must be positive")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseAvi(r.payload).iterator.flatMap { case (_, _, frames) =>
          frames.indices.by(everyNth).take(maxFrames).iterator.map { i =>
            val (off, len) = frames(i)
            FrameRecord(r.media_id, i,
              java.util.Arrays.copyOfRange(r.payload, off, off + len), len.toLong)
          }
        }
      }
    }
  }

  // --------------------------------------------------------------- pdf

  /**
   * Minimal PDF writer: one Helvetica Tj text object per page,
   * `/FlateDecode`-compressed content streams (raw when
   * `compress=false`), correct xref/trailer. Page text is written as
   * UTF-8 bytes in the string literal with `( ) \\ CR LF` escaped, so
   * [[pdfText]] round-trips it byte-exactly. Test/harness utility and
   * deterministic payload generator.
   */
  def simplePdf(pages: Seq[String], compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "simplePdf needs at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val nObjs = 3 + 2 * pages.length
    val offsets = new Array[Int](nObjs + 1)
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = out.size(); w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    val kids = pages.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) { w(s"<< /Type /Pages /Kids [$kids] /Count ${pages.length} >>\n") }
    obj(3) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n") }
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageObj = 4 + 2 * i
      val contObj = 5 + 2 * i
      obj(pageObj) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contObj 0 R >>\n")
      }
      val body = new java.io.ByteArrayOutputStream()
      body.write("BT /F1 12 Tf 72 720 Td (".getBytes("US-ASCII"))
      text.getBytes("UTF-8").foreach {
        case b @ ('(' | ')' | '\\') => body.write('\\'); body.write(b)
        case '\r' => body.write('\\'); body.write('r')
        case '\n' => body.write('\\'); body.write('n')
        case b => body.write(b)
      }
      body.write(") Tj ET".getBytes("US-ASCII"))
      val raw = body.toByteArray
      val data = if (compress) deflate(raw) else raw
      obj(contObj) {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        w("\nendstream\n")
      }
    }
    val xref = out.size()
    w(s"xref\n0 ${nObjs + 1}\n0000000000 65535 f \n")
    (1 to nObjs).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${nObjs + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsDictionary()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException("truncated")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Append the shown text of one content stream: a byte-level scan
    * collecting string literals (with PDF escapes, nested parens) and
    * attributing them to the next operator — `Tj`/`'`/`"` show the
    * last pending string, `TJ` shows every string of its array, any
    * other operator discards pending operands. */
  private def extractShownText(
      content: Array[Byte], out: java.io.ByteArrayOutputStream): Unit = {
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var i = 0
    val n = content.length
    def isWordChar(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == '*'
    while (i < n) {
      val c = content(i)
      if (c == '(') {
        val s = new java.io.ByteArrayOutputStream()
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val b = content(i)
          if (b == '\\' && i + 1 < n) {
            val e = content(i + 1)
            e match {
              case 'n' => s.write('\n'); i += 2
              case 'r' => s.write('\r'); i += 2
              case 't' => s.write('\t'); i += 2
              case 'b' => s.write('\b'); i += 2
              case 'f' => s.write('\f'); i += 2
              case '\n' => i += 2                       // line continuation
              case '\r' => i += (if (i + 2 < n && content(i + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var k = 0
                i += 1
                while (k < 3 && i < n && content(i) >= '0' && content(i) <= '7') {
                  v = v * 8 + (content(i) - '0'); i += 1; k += 1
                }
                s.write(v & 0xFF)
              case other => s.write(other); i += 2
            }
          } else if (b == '(') { depth += 1; s.write(b); i += 1 }
          else if (b == ')') { depth -= 1; if (depth > 0) s.write(b); i += 1 }
          else { s.write(b); i += 1 }
        }
        pending += s.toByteArray
      } else if (c == '%') {
        while (i < n && content(i) != '\n' && content(i) != '\r') i += 1
      } else if (c == '\'' || c == '"') {
        if (pending.nonEmpty) out.write(pending.last)
        pending.clear()
        i += 1
      } else if (isWordChar(c)) {
        val start = i
        while (i < n && isWordChar(content(i))) i += 1
        new String(content, start, i - start, "US-ASCII") match {
          case "Tj" => if (pending.nonEmpty) out.write(pending.last); pending.clear()
          case "TJ" => pending.foreach(out.write); pending.clear()
          case _ => pending.clear()
        }
      } else i += 1
    }
  }

  /**
   * Real PDF decode (pure JVM, public-spec subset): page count +
   * extracted text from every content stream, raw or `/FlateDecode`
   * (`java.util.zip.Inflater`). Text-showing operators `Tj`, `TJ`,
   * `'`, `"` over parenthesized literals are covered; hex strings and
   * font-encoding remapping are not (documented boundary — the bytes
   * shown are returned UTF-8-decoded). Stream texts CONCATENATE in
   * document order with no separator, so a [[simplePdf]] round-trip is
   * byte-exact. None when the payload is not PDF.
   */
  def pdfText(payload: Array[Byte]): Option[(Int, String)] = {
    if (payload == null || payload.length < 8) return None
    if (!new String(payload, 0, 5, "US-ASCII").equals("%PDF-")) return None
    try {
      val latin = new String(payload, "ISO-8859-1")
      val pageM = java.util.regex.Pattern
        .compile("/Type\\s*/Page(?![0-9A-Za-z])").matcher(latin)
      var pages = 0
      while (pageM.find()) pages += 1
      val out = new java.io.ByteArrayOutputStream()
      val lenRe = java.util.regex.Pattern.compile("/Length\\s+(\\d+)")
      var from = 0
      while ({ val k = latin.indexOf("stream", from); k >= 0 && {
        // must be the keyword, not e.g. "endstream": check boundary
        val isKeyword = (k == 0 || !latin.charAt(k - 1).isLetter) &&
          (k + 6 >= latin.length || !latin.charAt(k + 6).isLetter)
        var dataStart = k + 6
        if (isKeyword && dataStart < latin.length) {
          if (latin.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < latin.length && latin.charAt(dataStart) == '\n') dataStart += 1
          val dict = latin.substring(math.max(0, k - 600), k)
          val lm = lenRe.matcher(dict)
          var len = -1
          while (lm.find()) len = lm.group(1).toInt
          val dataEnd =
            if (len >= 0 && dataStart + len <= latin.length) dataStart + len
            else {
              val e = latin.indexOf("endstream", dataStart)
              if (e < 0) latin.length else e
            }
          val bytes = java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
          val data =
            if (dict.contains("/FlateDecode")) {
              try inflate(bytes) catch { case scala.util.control.NonFatal(_) => null }
            } else bytes
          if (data != null) extractShownText(data, out)
          from = dataEnd
        } else from = k + 6
        true
      }}) ()
      Some((pages, new String(out.toByteArray, "UTF-8")))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /**
   * Real PDF feature decode for [[extractFeatures]]: width carries the
   * page count, height the extracted character count, and the feature
   * is an 8-segment mean-byte envelope of the text (deterministic,
   * bounded). None when not a PDF.
   */
  private[pipeline] def decodePdf(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    pdfText(payload).map { case (pages, text) =>
      val bytes = text.getBytes("UTF-8")
      val feat = new Array[Float](8)
      if (bytes.nonEmpty) {
        val sums = new Array[Double](8)
        val cnts = new Array[Int](8)
        var i = 0
        while (i < bytes.length) {
          val w = math.min((i * 8L / bytes.length).toInt, 7)
          sums(w) += (bytes(i) & 0xFF) / 255.0
          cnts(w) += 1
          i += 1
        }
        var f = 0
        while (f < 8) { if (cnts(f) > 0) feat(f) = (sums(f) / cnts(f)).toFloat; f += 1 }
      }
      (pages, text.length, feat)
    }

  /**
   * Batch feature extraction over a media Dataset: one decoder
   * instantiation per partition (the shape a real decoder needs —
   * model/codec init amortized across the partition's rows). Image
   * payloads get the real `javax.imageio` path — genuine dimensions
   * and pooled-grayscale features; audio payloads get the real
   * `javax.sound.sampled` path — width/height carry (sampleRate,
   * channels) and the feature is the 8-window RMS envelope; video
   * payloads get the real AVI/MJPEG path — genuine container
   * dimensions and the keyframe luminance envelope; pdf payloads get
   * the real parser — width/height carry (pages, chars) and the
   * text-byte envelope; undecodable payloads and the stub-only
   * modalities ([[realDecoders]]) get [[stubDecode]].
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
        } else if (r.modality == "video") {
          decodeVideo(r.payload) match {
            case Some((w, h, _, feat)) =>
              MediaFeatures(r.media_id, r.modality, w, h, feat, r.payload.length.toLong)
            case None => stubDecode(r)
          }
        } else if (r.modality == "pdf") {
          decodePdf(r.payload) match {
            case Some((pages, chars, feat)) =>
              MediaFeatures(r.media_id, r.modality, pages, chars, feat, r.payload.length.toLong)
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
  // ------------------------------------------------ perceptual hashing

  /** Box-averaged luminance grid (`cols` x `rows`, row-major) of a
    * decoded frame; pixel reads are strided so giant frames cost at
    * most ~16k samples. Luminance is the integer (299r+587g+114b)/1000
    * form used across this file — exact for grayscale pixels. */
  private def lumGrid(
      img: java.awt.image.BufferedImage, cols: Int, rows: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](cols * rows)
    val cnts = new Array[Int](cols * rows)
    val sx = math.max(1, w / 128)
    val sy = math.max(1, h / 128)
    var y = 0
    while (y < h) {
      val cy = math.min(y * rows / h, rows - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * cols / w, cols - 1)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        val cell = cy * cols + cx
        sums(cell) += lum
        cnts(cell) += 1
        x += sx
      }
      y += sy
    }
    Array.tabulate(cols * rows)(i => if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
  }

  /** dHash (difference hash) of a decoded frame: 9x8 luminance grid,
    * bit (y*8 + x) set iff cell(y, x) > cell(y, x+1). Robust to
    * uniform brightness shifts; near-duplicate frames land within a
    * few bits of Hamming distance. */
  def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val g = lumGrid(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** aHash (average hash): 8x8 luminance grid, bit set iff the cell
    * exceeds the grid mean. */
  def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val g = lumGrid(img, 8, 8)
    val mean = g.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (g(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** dHash of an encoded image payload; None when undecodable. */
  def imageDHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(dHashOf(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** aHash of an encoded image payload; None when undecodable. */
  def imageAHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(aHashOf(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ------------------------------------------------------------ DCT pHash

  /** Orthonormal cosine basis row k evaluated at x, for length n. */
  private def dctCos(n: Int): Array[Array[Double]] =
    Array.tabulate(n, n)((k, x) =>
      math.cos(math.Pi * (2 * x + 1) * k / (2.0 * n)))

  private def dctScale(k: Int, n: Int): Double =
    if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)

  /** Separable orthonormal 2D DCT-II of an n x n row-major grid;
    * output layout `out(v * n + u)` with u the horizontal frequency.
    * Naive O(n^3) — n = 32 is ~65k multiplies, negligible next to the
    * image decode it follows. */
  private[pipeline] def dct2(g: Array[Double], n: Int): Array[Double] = {
    val c = dctCos(n)
    val tmp = new Array[Double](n * n) // rows transformed: tmp(y*n + u)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(y * n + x) * c(u)(x); x += 1 }
        tmp(y * n + u) = s * dctScale(u, n)
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](n * n)
    var v = 0
    while (v < n) {
      var u = 0
      while (u < n) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += tmp(yy * n + u) * c(v)(yy); yy += 1 }
        out(v * n + u) = s * dctScale(v, n)
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse of [[dct2]] (orthonormal, so the transpose). */
  private[pipeline] def idct2(d: Array[Double], n: Int): Array[Double] = {
    val c = dctCos(n)
    val tmp = new Array[Double](n * n) // tmp(y*n + u): columns inverted
    var u = 0
    while (u < n) {
      var y = 0
      while (y < n) {
        var s = 0.0
        var v = 0
        while (v < n) { s += d(v * n + u) * dctScale(v, n) * c(v)(y); v += 1 }
        tmp(y * n + u) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Double](n * n)
    var y2 = 0
    while (y2 < n) {
      var x = 0
      while (x < n) {
        var s = 0.0
        var uu = 0
        while (uu < n) { s += tmp(y2 * n + uu) * dctScale(uu, n) * c(uu)(x); uu += 1 }
        out(y2 * n + x) = s
        x += 1
      }
      y2 += 1
    }
    out
  }

  /** The 64 lowest-frequency AC positions (u, v) in diagonal order
    * (u + v ascending from 1, ascending u within a diagonal) — the
    * frozen bit layout of [[pHashOf]]. All fall in u + v <= 10. */
  private[pipeline] val zigzagAc64: Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var s = 1
    while (out.length < 64) {
      var u = 0
      while (u <= s && out.length < 64) {
        if (u < 32 && (s - u) < 32) out += ((u, s - u))
        u += 1
      }
      s += 1
    }
    out.toArray
  }

  /** pHash (DCT perceptual hash) of a decoded frame: 32x32 box-average
    * luminance grid → orthonormal 2D DCT → bit i = SIGN of the i-th
    * lowest-frequency AC coefficient ([[zigzagAc64]] order). The sign
    * rule (vs. the classic median rule) keeps every bit independent —
    * plantable in the DCT domain for exact-fixture oracles — and is
    * exactly invariant to brightness offsets (which touch only DC)
    * and positive contrast scaling (which scales all coefficients).
    * Survives rescaling where dHash/aHash survive it, plus mild
    * blur/sharpen that shifts box averages but not low-band signs. */
  def pHashOf(img: java.awt.image.BufferedImage): Long = {
    val d = dct2(lumGrid(img, 32, 32), 32)
    var bits = 0L
    var i = 0
    while (i < 64) {
      val (u, v) = zigzagAc64(i)
      if (d(v * 32 + u) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** pHash of an encoded image payload; None when undecodable. */
  def imagePHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length == 0) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(pHashOf(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** All three image signatures from ONE decode: (media_id, dhash,
    * ahash, phash). Feed any column into [[Dedup.hammingPairs]] /
    * [[Dedup.buildHashIndex]] — the signatures trade differently
    * (dHash/aHash survive rescale+gain, pHash additionally survives
    * offset/contrast and mild blur), and corpus-scale dedup usually
    * bands two of them and unions the pair sets. Undecodable
    * payloads → NULL struct → NULL columns (rows drop in the band
    * join). */
  def imageSignatures(media: Dataset[MediaRecord]): DataFrame = {
    val sigU = F.udf((payload: Array[Byte]) => {
      if (payload == null || payload.length == 0) null
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) null
        else (graft.pipeline.Multimodal.dHashOf(img),
              graft.pipeline.Multimodal.aHashOf(img),
              graft.pipeline.Multimodal.pHashOf(img))
      } catch { case scala.util.control.NonFatal(_) => null }
    })
    media.toDF()
      .withColumn("__s", sigU(F.col("payload")))
      .select(F.col("media_id"), F.col("__s._1").as("dhash"),
        F.col("__s._2").as("ahash"), F.col("__s._3").as("phash"))
  }

  /** dHash of an AVI video's FIRST decodable keyframe; None for
    * non-AVI payloads or when no frame decodes. Exact-copy and
    * re-containered videos collide at Hamming 0; re-encoded ones land
    * within a few bits (JPEG noise shifts box averages slightly). */
  def videoDHash(payload: Array[Byte]): Option[Long] =
    parseAvi(payload).flatMap { case (_, _, frames) =>
      frames.iterator.flatMap { case (off, len) =>
        try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(payload, off, off + len))))
            .filter(i => i.getWidth > 0 && i.getHeight > 0)
            .map(dHashOf)
        } catch { case scala.util.control.NonFatal(_) => None }
      }.take(1).toSeq.headOption
    }

  /** dHash of EACH of the first `maxFrames` decodable keyframes —
    * the multi-keyframe signature set that survives trims and re-cuts
    * where [[videoDHash]]'s first-frame-only form does not (dropping
    * the first keyframe replaces the whole single-frame signature).
    * None for non-AVI payloads or when no frame decodes; the bound
    * keeps the per-row cost and the downstream band fanout fixed
    * regardless of video length. */
  def videoDHashes(payload: Array[Byte], maxFrames: Int = 16): Option[Seq[Long]] = {
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    parseAvi(payload).map { case (_, _, frames) =>
      frames.iterator.flatMap { case (off, len) =>
        try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(payload, off, off + len))))
            .filter(i => i.getWidth > 0 && i.getHeight > 0)
            .map(dHashOf)
        } catch { case scala.util.control.NonFatal(_) => None }
      }.take(maxFrames).toSeq
    }.filter(_.nonEmpty)
  }

  /**
   * Multi-keyframe video near-duplicates: every decodable keyframe
   * (up to `maxFrames`) hashes separately, frame hashes go through
   * the SAME Hamming-banded bucket join as every other signature
   * ([[Dedup.hammingPairs]] keyed on a (media_id, frame) struct), and
   * frame-level matches collapse to one row per video pair with the
   * CLOSEST frame distance. A trimmed or re-cut copy shares its
   * surviving keyframes and is caught; the single-signature path
   * misses it whenever the first keyframe differs. Scale shape
   * unchanged from the image path: payloads decode map-side once,
   * only (band, bits) keys shuffle, buckets are capped — fanout is
   * maxFrames x bands rows per video.
   */
  def nearDuplicateVideos(
      media: Dataset[MediaRecord],
      maxHamming: Int = 6,
      bands: Int = 8,
      maxFrames: Int = 16,
      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val fhU = F.udf((payload: Array[Byte]) =>
      graft.pipeline.Multimodal.videoDHashes(payload, maxFrames)
        .getOrElse(Seq.empty[Long]))
    val frames = media.toDF()
      .filter(F.col("modality") === "video")
      .select(F.col("media_id"),
        F.posexplode(fhU(F.col("payload"))).as(Seq("__fi", "__fh")))
      .select(F.struct(F.col("media_id"), F.col("__fi")).as("__fid"),
        F.col("__fh"))
    Dedup.hammingPairs(frames, "__fid", "__fh", maxHamming, bands, maxBucket)
      .select(F.col("id_a.media_id").as("__a"), F.col("id_b.media_id").as("__b"),
        F.col("hamming"))
      .filter(F.col("__a") =!= F.col("__b"))
      .select(F.least(F.col("__a"), F.col("__b")).as("id_a"),
        F.greatest(F.col("__a"), F.col("__b")).as("id_b"), F.col("hamming"))
      .groupBy(F.col("id_a"), F.col("id_b"))
      .agg(F.min(F.col("hamming")).as("hamming"))
  }

  /** First-channel PCM samples in [-1, 1], strided past ~64k frames —
    * the raw-sample sibling of [[decodeAudio]]'s envelope read. */
  private def pcmMonoSamples(payload: Array[Byte]): Option[Array[Double]] = {
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
      val stride = math.max(1, frames / 65536)
      val out = new Array[Double]((frames + stride - 1) / stride)
      var f = 0
      var i = 0
      while (f < frames) {
        val off = f * blockAlign
        out(i) =
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
        i += 1
        f += stride
      }
      Some(if (i == out.length) out else java.util.Arrays.copyOf(out, i))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /**
   * Gain-invariant audio fingerprint (chromaprint-style, reduced to
   * one 64-bit signature): the first channel splits into 64
   * equal-time frames; bits 0-31 compare the mean-square energy of
   * each frame PAIR (bit i set iff e(2i+1) > e(2i) — the temporal
   * envelope), bits 32-63 threshold each of the first 32 frames'
   * spectral brightness (bit set iff first-difference energy exceeds
   * 2x the frame energy — high-frequency content rides first
   * differences). Every bit is a ratio of energies, so uniform gain
   * scaling cancels exactly; exact copies and remastered-volume
   * copies land at Hamming 0. None for undecodable payloads or
   * fewer than 64 samples.
   */
  def audioFingerprint(payload: Array[Byte]): Option[Long] =
    pcmMonoSamples(payload).filter(_.length >= 64).map { s =>
      val n = s.length
      val e = new Array[Double](64)
      val h = new Array[Double](64)
      var f = 0
      while (f < 64) {
        val from = (f.toLong * n / 64).toInt
        val until = ((f + 1).toLong * n / 64).toInt
        var es = 0.0
        var hs = 0.0
        var j = from
        while (j < until) {
          es += s(j) * s(j)
          if (j > from) { val d = s(j) - s(j - 1); hs += d * d }
          j += 1
        }
        val cnt = until - from
        e(f) = if (cnt == 0) 0.0 else es / cnt
        h(f) = if (cnt <= 1) 0.0 else hs / (cnt - 1)
        f += 1
      }
      var bits = 0L
      var i = 0
      while (i < 32) {
        if (e(2 * i + 1) > e(2 * i)) bits |= 1L << i
        if (h(i) > 2.0 * e(i)) bits |= 1L << (32 + i)
        i += 1
      }
      bits
    }

  /** Modality-dispatched perceptual hash: image payloads hash
    * directly, videos hash their first keyframe, audio payloads get
    * the gain-invariant [[audioFingerprint]]; other modalities (and
    * undecodable payloads) yield NULL per the repo's malformed-input
    * discipline. */
  def perceptualHash(media: Dataset[MediaRecord]): DataFrame =
    media.toDF().withColumn("phash",
      perceptualHashCol(F.col("modality"), F.col("payload")))

  /** Column form of the modality dispatch — usable on any frame with
    * (modality, payload) columns, including STREAMING ones
    * ([[graft.streaming.SketchStreaming.mediaDupStream]]). */
  def perceptualHashCol(
      modality: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val phU = F.udf((m: String, p: Array[Byte]) => m match {
      case "image" => graft.pipeline.Multimodal.imageDHash(p)
      case "video" => graft.pipeline.Multimodal.videoDHash(p)
      case "audio" => graft.pipeline.Multimodal.audioFingerprint(p)
      case _ => None: Option[Long]
    })
    phU(modality, payload)
  }

  /**
   * Perceptual near-duplicate pairs over a media corpus — the
   * no-embedding-model dedup path (the media analogue of
   * [[Dedup.simhashPairs]] next to [[Dedup.embeddingDupPairs]]):
   * dHash per record ([[perceptualHash]]), then Hamming-banded
   * bucketing + exact verification via [[Dedup.hammingPairs]].
   * Returns (id_a, id_b, hamming) with id_a < id_b. Map-only hashing;
   * the only shuffle is on 8-byte (band, bits) keys — never payloads.
   */
  def nearDuplicateMedia(
      media: Dataset[MediaRecord],
      maxHamming: Int = 6,
      bands: Int = 8): DataFrame =
    Dedup.hammingPairs(
      perceptualHash(media).select(F.col("media_id"), F.col("phash")),
      "media_id", "phash", maxHamming, bands)

  /** Persistable perceptual-hash index over a media corpus —
    * [[Dedup.buildHashIndex]] over [[perceptualHash]]; save/reload
    * with `Dedup.saveSignatureIndex`/`loadSignatureIndex`. Records
    * with no hash contribute no rows. */
  def buildMediaHashIndex(
      media: Dataset[MediaRecord], bands: Int = 8): DataFrame =
    Dedup.buildHashIndex(
      perceptualHash(media).select(F.col("media_id"), F.col("phash")),
      "media_id", "phash", bands)

  /** Incremental perceptual dedup: (id_new, id_old, hamming) pairs
    * between a media batch and the history behind a persisted
    * [[buildMediaHashIndex]] — the batch decodes and hashes, history
    * does NOT (its signatures ride in the index). */
  def incrementalNearDuplicateMedia(
      batch: Dataset[MediaRecord],
      histIndex: DataFrame,
      maxHamming: Int = 6,
      bands: Int = 8): DataFrame =
    Dedup.incrementalHammingPairs(
      perceptualHash(batch).select(F.col("media_id"), F.col("phash")),
      histIndex, "media_id", "phash", maxHamming, bands)

  /** Drop every record whose perceptual hash duplicates (within
    * `maxHamming`) a lower-id record — the greedy keep-first form the
    * other dedup families use. Records with no hash (undecodable or
    * unhashable modality) always survive. */
  def dropNearDuplicateMedia(
      media: Dataset[MediaRecord],
      maxHamming: Int = 6,
      bands: Int = 8): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    val dupIds = nearDuplicateMedia(media, maxHamming, bands)
      .select(F.col("id_b").as("media_id")).distinct()
    media.toDF().join(dupIds, Seq("media_id"), "left_anti").as[MediaRecord]
  }

  /** Deterministic 9x8 grayscale PNG whose [[dHashOf]] is EXACTLY
    * `hash`: each row walks left-to-right, stepping -14 when the
    * corresponding hash bit is set (left cell brighter) and +14
    * otherwise. On a 9x8 image the box-average grid IS the pixel
    * grid, so the planted bits survive the encode/decode round trip
    * exactly. Spec/oracle fixture generator. */
  def imageForDHash(hash: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      var x = 0
      while (x < 8) {
        v = if (((hash >>> (y * 8 + x)) & 1L) == 1L) v - 14 else v + 14
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 32x32 grayscale PNG whose [[pHashOf]] is EXACTLY
    * `hash`, planted in the DCT domain: DC = 128·32 (mean-128 image),
    * the 64 [[zigzagAc64]] coefficients = ±24 by hash bit, everything
    * else 0; pixels are the IDCT, which stays within 128 ± 96 so no
    * clamping ever occurs, and the ±24 magnitude dwarfs the <= ~1
    * coefficient perturbation from integer pixel rounding, so every
    * planted sign survives the encode/decode round trip. On a 32x32
    * image the box-average grid IS the pixel grid (the
    * [[imageForDHash]] argument). Spec/oracle fixture generator. */
  def imageForPHash(hash: Long): Array[Byte] = {
    val d = new Array[Double](32 * 32)
    d(0) = 128.0 * 32
    var i = 0
    while (i < 64) {
      val (u, v) = zigzagAc64(i)
      d(v * 32 + u) = if (((hash >>> i) & 1L) == 1L) 24.0 else -24.0
      i += 1
    }
    val px = idct2(d, 32)
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val v = math.max(0, math.min(255, math.round(px(y * 32 + x)).toInt))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic trimmed-video corpus for specs and oracles: ids
    * group in pairs (`id / 2`); the even id is a 2-keyframe AVI
    * [random frame, base frame], the odd id is its TRIMMED re-cut —
    * the first keyframe dropped and the surviving frame re-encoded
    * with ONE planted bit flipped (within-pair closest-frame Hamming
    * is exactly 1). First-keyframe-only signatures are ~Binomial(64,
    * 1/2) apart (they compare the random frame against the survivor),
    * so the pair is invisible to [[videoDHash]]-based dedup and an
    * oracle can pin both facts from id arithmetic. Frames are planted
    * [[imageForDHash]] PNGs riding in the AVI container (the parser
    * hands chunk bytes to ImageIO, which sniffs the format). */
  def plantedTrimmedVideos(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val mk = F.udf((id: Long) => {
      val g = id / 2
      val base = TextFunctions.mix64(g + 0x5851F42D4C957F2DL)
      val lead = TextFunctions.mix64(base)
      val bit = ((base >>> 23) & 0x3F).toInt
      val frames =
        if (id % 2 == 0L)
          Seq(graft.pipeline.Multimodal.imageForDHash(lead),
              graft.pipeline.Multimodal.imageForDHash(base))
        else Seq(graft.pipeline.Multimodal.imageForDHash(base ^ (1L << bit)))
      graft.pipeline.Multimodal.mjpegAvi(frames, 9, 8)
    })
    docs.select(
      F.col(idCol).cast("long").as("media_id"),
      F.lit("video").as("modality"),
      mk(F.col(idCol).cast("long")).as("payload"),
      F.lit(0L).as("meta_bytes"),
      F.lit("planted").as("meta_source")).as[MediaRecord]
  }

  /** Deterministic 16-bit mono WAV whose [[audioFingerprint]] is
    * EXACTLY `hash`: 64 square-wave frames of 128 samples — envelope
    * bit i picks the (0.2, 0.5) amplitude ORDER of frame pair
    * (2i, 2i+1) (energy ratio 6.25, far from any tie), brightness bit
    * i picks frame i's square period (2 → diff energy 4x frame
    * energy, 16 → 0.5x; threshold 2 sits between). Spec/oracle
    * fixture generator, the audio sibling of [[imageForDHash]]. */
  def wavForFingerprint(hash: Long): Array[Byte] = {
    val data = new Array[Byte](64 * 128 * 2)
    var f = 0
    while (f < 64) {
      val pairBit = ((hash >>> (f / 2)) & 1L) == 1L
      val amp = if (((f % 2 == 1) == pairBit)) 0.5 else 0.2
      val period = if (f < 32 && ((hash >>> (32 + f)) & 1L) == 1L) 2 else 16
      var j = 0
      while (j < 128) {
        val sign = if ((j / (period / 2)) % 2 == 0) 1 else -1
        val v = (sign * amp * 32767).toInt
        val off = (f * 128 + j) * 2
        data(off) = (v & 0xFF).toByte
        data(off + 1) = ((v >> 8) & 0xFF).toByte
        j += 1
      }
      f += 1
    }
    pcmWav(data, 8000, channels = 1, bitsPerSample = 16)
  }

  /**
   * Deterministic near-duplicate image corpus for specs and oracles:
   * ids group by `id / 3`; variant 0 carries a group-random planted
   * dHash, variant 1 flips 1 bit of it, variant 2 flips 4 bits
   * disjoint from variant 1's — within-group dHash distances are
   * EXACTLY 1 (v0-v1), 4 (v0-v2) and 5 (v1-v2), while cross-group
   * distances are ~Binomial(64, 1/2) (P(<= 6) ~ 5e-12). An oracle can
   * therefore derive the full expected pair set from id arithmetic.
   */
  def plantedNearDupMedia(
      docs: DataFrame, idCol: String, phash: Boolean = false): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val mk = F.udf((id: Long) => {
      val g = id / 3
      val base = TextFunctions.mix64(g + 0x9E3779B97F4A7C15L)
      val b1 = ((base >>> 17) & 0x3F).toInt
      val hash = (id % 3) match {
        case 0L => base
        case 1L => base ^ (1L << b1)
        case _ =>
          base ^ (1L << ((b1 + 7) % 64)) ^ (1L << ((b1 + 19) % 64)) ^
            (1L << ((b1 + 31) % 64)) ^ (1L << ((b1 + 43) % 64))
      }
      if (phash) graft.pipeline.Multimodal.imageForPHash(hash)
      else graft.pipeline.Multimodal.imageForDHash(hash)
    })
    docs.select(
      F.col(idCol).cast("long").as("media_id"),
      F.lit("image").as("modality"),
      mk(F.col(idCol).cast("long")).as("payload"),
      F.lit(0L).as("meta_bytes"),
      F.lit("planted").as("meta_source"))
      .as[MediaRecord]
  }

  /** Audio sibling of [[plantedNearDupMedia]]: WAV payloads via
    * [[wavForFingerprint]] with the same group/variant bit-flip plan,
    * so within-group fingerprint distances are exactly 1/4/5 and an
    * oracle derives the full pair set from id arithmetic. */
  def plantedNearDupAudio(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val mk = F.udf((id: Long) => {
      val g = id / 3
      val base = TextFunctions.mix64(g + 0x7F4A7C159E3779B9L)
      val b1 = ((base >>> 23) & 0x3F).toInt
      val hash = (id % 3) match {
        case 0L => base
        case 1L => base ^ (1L << b1)
        case _ =>
          base ^ (1L << ((b1 + 7) % 64)) ^ (1L << ((b1 + 19) % 64)) ^
            (1L << ((b1 + 31) % 64)) ^ (1L << ((b1 + 43) % 64))
      }
      graft.pipeline.Multimodal.wavForFingerprint(hash)
    })
    docs.select(
      F.col(idCol).cast("long").as("media_id"),
      F.lit("audio").as("modality"),
      mk(F.col(idCol).cast("long")).as("payload"),
      F.lit(0L).as("meta_bytes"),
      F.lit("planted").as("meta_source"))
      .as[MediaRecord]
  }

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

  /**
   * CLIP-style image-text alignment score: the cosine between a
   * sample's image embedding and its caption embedding — the
   * LAION-family curation signal (keep pairs whose modalities agree;
   * drop alt-text that does not describe its image). The embeddings
   * come from the caller's dual encoder (decode/encode is the stubbed
   * media boundary, like every model in this repo); the Spark side —
   * pairing, scoring, thresholding — is real and map-only.
   * NULL/ragged vectors score NULL (repo NULL discipline).
   */
  def alignmentScores(
      pairs: DataFrame,
      imgVecCol: String,
      txtVecCol: String,
      outCol: String = "alignment"): DataFrame =
    pairs.withColumn(outCol,
      Similarity.cosine(F.col(imgVecCol), F.col(txtVecCol)))

  /** Keep pairs whose alignment clears `threshold` (NULL-scored rows —
    * missing either embedding — drop, like every filter here). The
    * score column rides along for auditability. */
  def filterAligned(
      pairs: DataFrame,
      imgVecCol: String,
      txtVecCol: String,
      threshold: Double,
      outCol: String = "alignment"): DataFrame =
    alignmentScores(pairs, imgVecCol, txtVecCol, outCol)
      .filter(F.col(outCol) >= threshold)
}
