package graft.pipeline

import graft.SparkTestBase
import graft.pipeline.Multimodal.MediaRecord
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class ImageDecodeSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory PNG: left half black, right half white. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("extractFeatures reports real dimensions and pooled grayscale for PNG payloads") {
    val media = Seq(
      MediaRecord(1L, "image", png(100, 60), 0L, "s"),
      MediaRecord(2L, "image", "not an image at all".getBytes("UTF-8"), 0L, "s"),
      MediaRecord(3L, "audio", png(100, 60), 0L, "s"))   // stub modality: stub even for real PNG bytes
      .toDS().repartition(2)
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap

    val real = out(1L)
    assert(real.width === 100 && real.height === 60)
    assert(real.feature.length === 8)
    // left half black, right half white → cells 0-1 and 4-5 dark, 2-3 and 6-7 bright
    for (c <- Seq(0, 1, 4, 5)) assert(real.feature(c) < 0.1, s"cell $c should be dark")
    for (c <- Seq(2, 3, 6, 7)) assert(real.feature(c) > 0.9, s"cell $c should be bright")
    assert(real.payload_bytes === png(100, 60).length.toLong)

    // undecodable image payload falls back to the deterministic stub
    val stub = out(2L)
    val stubExp = Multimodal.stubDecode(
      MediaRecord(2L, "image", "not an image at all".getBytes("UTF-8"), 0L, "s"))
    assert((stub.width, stub.height, stub.feature.toSeq) ===
      ((stubExp.width, stubExp.height, stubExp.feature.toSeq)))

    // PNG bytes are not decodable audio → audio row falls back to stub
    val audio = out(3L)
    val audioExp = Multimodal.stubDecode(MediaRecord(3L, "audio", png(100, 60), 0L, "s"))
    assert((audio.width, audio.height, audio.feature.toSeq) ===
      ((audioExp.width, audioExp.height, audioExp.feature.toSeq)))
  }

  test("resizeImages downscales oversize images preserving aspect, passes small ones through") {
    val media = Seq(
      MediaRecord(1L, "image", png(200, 100), 0L, "s"),   // over maxDim: downscale
      MediaRecord(2L, "image", png(40, 20), 0L, "s"),     // within: untouched
      MediaRecord(3L, "image", Array[Byte](1, 2, 3), 0L, "s"),  // undecodable: untouched
      MediaRecord(4L, "video", png(200, 100), 0L, "s"))   // non-image: untouched
      .toDS()
    val out = Multimodal.resizeImages(media, 50).collect().map(r => r.media_id -> r).toMap

    val shrunk = ImageIO.read(new java.io.ByteArrayInputStream(out(1L).payload))
    assert(shrunk.getWidth === 50 && shrunk.getHeight === 25)
    assert(out(2L).payload.toSeq === png(40, 20).toSeq)
    assert(out(3L).payload.toSeq === Seq[Byte](1, 2, 3))
    assert(out(4L).payload.toSeq === png(200, 100).toSeq)

    // resized output is itself decodable by extractFeatures with real dims
    val feats = Multimodal.extractFeatures(
        Multimodal.resizeImages(media, 50))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width === 50 && feats(1L).height === 25)
  }

  test("realDecoders capability flag marks image/audio/video/pdf as real") {
    assert(Multimodal.realDecoders("image"))
    assert(Multimodal.realDecoders("audio"))
    assert(Multimodal.realDecoders.filter(_._2).keySet ===
      Set("image", "audio", "video", "pdf"))
    assert(!Multimodal.realDecoders("text"))
  }
}
