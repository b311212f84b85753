package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Real video (MJPEG-in-AVI) and PDF decode — pure-JVM container
  * parsing per the public specs; see Multimodal.realDecoders. */
class MediaContainersSpec extends SparkTestBase {
  import spark.implicits._

  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("mjpegAvi round-trips through decodeVideo: dims, frame count, luminance") {
    val frames = Seq(20, 230, 20, 230, 120).map(v => jpegFrame(48, 32, v))
    val avi = Multimodal.mjpegAvi(frames, 48, 32, fps = 5)
    val Some((w, h, n, feat)) = Multimodal.decodeVideo(avi)
    assert((w, h, n) === ((48, 32, 5)))
    // 5 frames over 8 slots: slots 0..4 are the 5 frames in order
    assert(feat(1) > feat(0) + 0.5f)       // bright frame vs dark frame
    assert(feat.forall(f => f >= 0.0f && f <= 1.0f))
  }

  test("sampleKeyframes explodes real decodable JPEG frames with bounds") {
    val frames = Seq.tabulate(6)(i => jpegFrame(16, 16, 40 * i))
    val media = Seq(Multimodal.MediaRecord(
      7L, "video", Multimodal.mjpegAvi(frames, 16, 16), 0L, "t")).toDS()
    val out = Multimodal.sampleKeyframes(media, everyNth = 2, maxFrames = 2).collect()
    assert(out.map(_.frame_idx).toSeq === Seq(0, 2))
    out.foreach { fr =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fr.payload))
      assert(img != null && img.getWidth === 16 && img.getHeight === 16)
    }
    // non-AVI payloads contribute no rows
    val junk = Seq(Multimodal.MediaRecord(8L, "video",
      Array.fill[Byte](256)(42), 0L, "t")).toDS()
    assert(Multimodal.sampleKeyframes(junk, 1, 10).count() === 0L)
  }

  test("video decode NULL discipline: garbage and truncated AVIs fall back to the stub") {
    assert(Multimodal.decodeVideo(null).isEmpty)
    assert(Multimodal.decodeVideo(Array[Byte](1, 2, 3)).isEmpty)
    val avi = Multimodal.mjpegAvi(Seq(jpegFrame(8, 8, 99)), 8, 8)
    (1 until avi.length by 37).foreach { cut =>
      Multimodal.decodeVideo(java.util.Arrays.copyOf(avi, cut)) // must not throw
    }
    // extractFeatures falls back to the stub rather than erroring
    val media = Seq(Multimodal.MediaRecord(
      1L, "video", Array[Byte](1, 2, 3, 4), 0L, "t")).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.feature.length === 8)
  }

  test("simplePdf round-trips byte-exactly through pdfText (flate and raw)") {
    val pages = Seq(
      "plain ascii page",
      "escapes: (parens) and \\backslash\\ and\nnewline\rreturn",
      "unicode: héllo wörld — 世界 😃")
    for (compress <- Seq(true, false)) {
      val pdf = Multimodal.simplePdf(pages, compress)
      val Some((n, text)) = Multimodal.pdfText(pdf)
      assert(n === 3, s"compress=$compress")
      assert(text === pages.mkString(""), s"compress=$compress")
    }
  }

  test("pdfText handles TJ arrays, quote operators, octal escapes, garbage") {
    // hand-written raw PDF exercising operators simplePdf does not emit
    val content = "BT [(A) -120 (B)] TJ (C) ' 0 0 Td (\\101\\102) Tj ET"
    val raw = ("%PDF-1.4\n1 0 obj << /Type /Page >> endobj\n" +
      s"2 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\n" +
      "trailer\n%%EOF\n").getBytes("ISO-8859-1")
    val Some((pages, text)) = Multimodal.pdfText(raw)
    assert(pages === 1)
    assert(text === "ABCAB")
    assert(Multimodal.pdfText("not a pdf at all".getBytes).isEmpty)
    assert(Multimodal.pdfText(null).isEmpty)
    // truncated PDFs never throw
    val pdf = Multimodal.simplePdf(Seq("abc"), compress = true)
    (1 until pdf.length by 23).foreach { cut =>
      Multimodal.pdfText(java.util.Arrays.copyOf(pdf, cut))
    }
  }

  test("container parsers never throw on random bytes (NULL discipline under fuzz)") {
    val rnd = new scala.util.Random(1234)
    (0 until 500).foreach { i =>
      val len = 1 + rnd.nextInt(512)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      Multimodal.decodeVideo(b)   // must not throw
      Multimodal.pdfText(b)       // must not throw
      // seed with valid magic bytes so parsing gets past the header
      if (len >= 12) {
        "RIFF".getBytes.copyToArray(b, 0); "AVI ".getBytes.copyToArray(b, 8)
        Multimodal.decodeVideo(b)
      }
      if (len >= 5) {
        "%PDF-".getBytes.copyToArray(b, 0)
        Multimodal.pdfText(b)
      }
    }
    // crafted chunk size near Int.MaxValue: the bounds check must not
    // int-overflow into accepting an out-of-range frame slice
    val evil = Multimodal.mjpegAvi(Seq(jpegFrame(8, 8, 50)), 8, 8)
    val moviAt = {
      // find the movi LIST's first frame chunk ("00dc") and corrupt its size
      var i = 0
      while (!(evil(i) == '0' && evil(i + 1) == '0' && evil(i + 2) == 'd' &&
        evil(i + 3) == 'c')) i += 1
      i + 4
    }
    evil(moviAt) = 0xF8.toByte; evil(moviAt + 1) = 0xFF.toByte
    evil(moviAt + 2) = 0xFF.toByte; evil(moviAt + 3) = 0x7F.toByte   // ~Int.MaxValue
    assert(Multimodal.decodeVideo(evil).isEmpty)
    val evilMedia = Seq(Multimodal.MediaRecord(9L, "video", evil, 0L, "t")).toDS()
    assert(Multimodal.sampleKeyframes(evilMedia, 1, 10).count() === 0L)

    // corrupted-in-the-middle real payloads: flip bytes, never throw
    val avi = Multimodal.mjpegAvi(Seq(jpegFrame(8, 8, 50), jpegFrame(8, 8, 200)), 8, 8)
    val pdf = Multimodal.simplePdf(Seq("some text"), compress = true)
    (0 until 200).foreach { _ =>
      val a = avi.clone(); a(rnd.nextInt(a.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeVideo(a)
      val p = pdf.clone(); p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte
      Multimodal.pdfText(p)
    }
  }

  test("extractFeatures routes video and pdf through the real decoders") {
    val avi = Multimodal.mjpegAvi(Seq(jpegFrame(24, 12, 200)), 24, 12)
    val pdf = Multimodal.simplePdf(Seq("twelve chars"))
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", avi, 0L, "t"),
      Multimodal.MediaRecord(2L, "pdf", pdf, 0L, "t")).toDS()
    val out = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).width === 24 && out(1L).height === 12)
    assert(out(2L).width === 1 && out(2L).height === "twelve chars".length)
    assert(Multimodal.realDecoders("video") && Multimodal.realDecoders("pdf"))
  }
}
