package graft.pipeline

import graft.SparkTestBase
import graft.pipeline.Multimodal.MediaRecord

class AudioDecodeSpec extends SparkTestBase {
  import spark.implicits._

  /** 8-bit unsigned PCM: constant amplitude `amp` (0..127) around the
    * 128 midpoint, alternating sign per sample → RMS = amp/128. */
  private def squareWave(n: Int, amp: Int): Array[Byte] =
    Array.tabulate(n)(i => (128 + (if (i % 2 == 0) amp else -amp)).toByte)

  test("decodeAudio reads rate, channels, frames, and RMS envelope from WAV") {
    val wav = Multimodal.pcmWav(squareWave(8000, 64), 8000)
    val Some((rate, ch, frames, feat)) = Multimodal.decodeAudio(wav)
    assert(rate === 8000 && ch === 1 && frames === 8000L)
    assert(feat.length === 8)
    // constant-amplitude square wave: every window RMS = 64/128 = 0.5
    feat.foreach(v => assert(math.abs(v - 0.5f) < 1e-3, feat.toSeq))

    // amplitude ramp across windows shows in the envelope
    val ramp = Array.tabulate(8000) { i =>
      val amp = (i * 8 / 8000) * 16      // 0, 16, 32, ... 112 per window
      (128 + (if (i % 2 == 0) amp else -amp)).toByte
    }
    val Some((_, _, _, env)) = Multimodal.decodeAudio(Multimodal.pcmWav(ramp, 8000))
    assert(env(0) < 0.01f)
    (1 until 8).foreach(i => assert(env(i) > env(i - 1), env.toSeq))
    assert(math.abs(env(7) - 112f / 128f) < 1e-2)
  }

  test("decodeAudio handles 16-bit PCM and rejects garbage") {
    // 16-bit LE signed: constant +/- 16384 → RMS = 0.5
    val data = new Array[Byte](4000)
    var i = 0
    while (i < 2000) {
      val v = if (i % 2 == 0) 16384 else -16384
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val wav = Multimodal.pcmWav(data, 16000, channels = 1, bitsPerSample = 16)
    val Some((rate, ch, frames, feat)) = Multimodal.decodeAudio(wav)
    assert(rate === 16000 && ch === 1 && frames === 2000L)
    feat.foreach(v => assert(math.abs(v - 0.5f) < 1e-3, feat.toSeq))

    assert(Multimodal.decodeAudio("definitely not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)
  }

  test("decodeAudio handles big-endian 16-bit PCM (AIFF container)") {
    import javax.sound.sampled._
    // 2000 frames of +/-8192 at 8kHz, 16-bit signed BIG-endian
    val data = new Array[Byte](4000)
    var i = 0
    while (i < 2000) {
      val v = if (i % 2 == 0) 8192 else -8192
      data(2 * i) = ((v >> 8) & 0xFF).toByte      // big-endian: hi first
      data(2 * i + 1) = (v & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, true)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, 2000)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, out)
    val Some((rate, ch, frames, feat)) = Multimodal.decodeAudio(out.toByteArray)
    assert(rate === 8000 && ch === 1 && frames === 2000L)
    // constant |amplitude| 8192/32768 = 0.25
    feat.foreach(v => assert(math.abs(v - 0.25f) < 1e-3, feat.toSeq))
  }

  test("extractFeatures routes audio through the real decoder with stub fallback") {
    val wav = Multimodal.pcmWav(squareWave(4000, 32), 8000)
    val media = Seq(
      MediaRecord(1L, "audio", wav, 0L, "s"),
      MediaRecord(2L, "audio", "broken".getBytes("UTF-8"), 0L, "s"),
      MediaRecord(3L, "video", wav, 0L, "s"))   // still a stub modality
      .toDS().repartition(2)
    val out = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap

    assert(out(1L).width === 8000)              // sample rate
    assert(out(1L).height === 1)                // channels
    assert(out(1L).payload_bytes === wav.length.toLong)
    out(1L).feature.foreach(v => assert(math.abs(v - 0.25f) < 1e-3))

    val stubExp = Multimodal.stubDecode(
      MediaRecord(2L, "audio", "broken".getBytes("UTF-8"), 0L, "s"))
    assert(out(2L).width === stubExp.width && out(2L).feature.toSeq === stubExp.feature.toSeq)
    val videoExp = Multimodal.stubDecode(MediaRecord(3L, "video", wav, 0L, "s"))
    assert(out(3L).width === videoExp.width && out(3L).feature.toSeq === videoExp.feature.toSeq)
  }
}
