package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import graft.operators.Multimodal

/** Real decode of uncompressed media (WAV PCM / BMP) — byte-exact
  * fixtures synthesized per the public format specs, verified against
  * independently computed expectations.
  */
class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  /** Mono 16-bit PCM WAV: `samples` at `rate` Hz. */
  private def wavBytes(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2)      // block align
      .putShort(16)     // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** 24-bpp bottom-up BMP of one solid (r, g, b) color. */
  private def bmpBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataLen = rowBytes * h
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("BM".getBytes("US-ASCII")).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, data offset
      .putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (_ <- 0 until h) {
      for (_ <- 0 until w) { buf.put(b.toByte).put(g.toByte).put(r.toByte) }
      for (_ <- w * 3 until rowBytes) buf.put(0.toByte)
    }
    buf.array()
  }

  test("WAV PCM: header fields, duration, RMS and peak decode exactly") {
    // one second of constant amplitude 16384 (= 0.5 normalized)
    val w = MediaCodecs.decodeWav(wavBytes(Array.fill[Short](8000)(16384), 8000)).get
    assert(w.channels == 1 && w.sampleRate == 8000 && w.bitsPerSample == 16)
    assert(w.nSamples == 8000 && w.durationMs == 1000.0)
    assert(w.rms == 0.5 && w.peak == 0.5)
    // a sine's RMS is amplitude/sqrt(2)
    val amp = 20000.0
    val sine = Array.tabulate[Short](8000)(i =>
      math.round(amp * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    val ws = MediaCodecs.decodeWav(wavBytes(sine, 8000)).get
    assert(math.abs(ws.rms - amp / 32768.0 / math.sqrt(2)) < 1e-3)
    // garbage and truncated payloads decode to None, never throw
    assert(MediaCodecs.decodeWav("not audio at all".getBytes).isEmpty)
    assert(MediaCodecs.decodeWav(wavBytes(sine, 8000).take(30)).isEmpty)
  }

  test("BMP: dimensions and mean channel values decode exactly") {
    val b = MediaCodecs.decodeBmp(bmpBytes(5, 3, 10, 20, 30)).get
    assert(b.width == 5 && b.height == 3 && b.bitsPerPixel == 24)
    assert(b.meanR == 10.0 && b.meanG == 20.0 && b.meanB == 30.0)
    assert(MediaCodecs.decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("BMP thumbnail: nearest-neighbor resize to RGB triples") {
    val t = MediaCodecs.bmpThumbnail(bmpBytes(16, 16, 200, 100, 50), maxSide = 4).get
    assert(t.length == 4 * 4 * 3)
    assert(t.grouped(3).forall(p =>
      (p(0) & 0xff) == 200 && (p(1) & 0xff) == 100 && (p(2) & 0xff) == 50))
    // small images are not upscaled
    assert(MediaCodecs.bmpThumbnail(bmpBytes(2, 2, 1, 2, 3), maxSide = 8).get.length == 2 * 2 * 3)
  }

  test("property: WAV synth/decode round-trips random PCM signals exactly") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 20) {
      val n = 1 + rnd.nextInt(500)
      val rate = 1000 + rnd.nextInt(47000)
      val samples = Array.fill[Short](n)(rnd.nextInt(65536).toShort)
      val w = MediaCodecs.decodeWav(wavBytes(samples, rate)).get
      assert(w.nSamples == n && w.sampleRate == rate &&
        w.channels == 1 && w.bitsPerSample == 16)
      val norm = samples.map(_.toDouble / 32768.0)
      val expRms = math.sqrt(norm.map(v => v * v).sum / n)
      assert(math.abs(w.rms - expRms) < 1e-12)
      assert(w.peak == norm.map(math.abs).max)
    }
  }

  test("decodeMedia dispatches on magic bytes with stub fallback (Spark path)") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wavBytes(Array.fill[Short](100)(1000), 8000)),
      Multimodal.MediaRecord(2L, "image", bmpBytes(4, 2, 9, 8, 7)),
      Multimodal.MediaRecord(3L, "video", Array.fill[Byte](999)(42)) // no real codec
    ).toDS()
    val out = Multimodal.decodeMedia(recs).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).decoder == "wav_pcm" && out(1L).sample_rate == 8000 &&
      out(1L).n_frames == 100)
    assert(out(2L).decoder == "bmp" && out(2L).width == 4 && out(2L).height == 2 &&
      out(2L).mean_r == 9.0)
    assert(out(3L).decoder == "stub" && out(3L).byte_len == 999)
  }
}
