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

  // A fixed 4x4 JPEG (x-ramp red, y-ramp green, blue=200) produced once
  // with this container's JDK encoder — the golden-byte case for the
  // compressed-image decode path. The pinned means are exact /16 binary
  // doubles from this exact byte stream under this JDK's libjpeg port.
  private val goldenJpegHex =
    "ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707" +
    "070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c" +
    "1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d" +
    "0d1832211c2132323232323232323232323232323232323232323232323232323232" +
    "3232323232323232323232323232323232323232323232ffc0001108000400040301" +
    "2200021101031101ffc4001f00000105010101010101000000000000000001020304" +
    "05060708090a0bffc400b5100002010303020403050504040000017d010203000411" +
    "05122131410613516107227114328191a1082342b1c11552d1f02433627282090a16" +
    "1718191a25262728292a3435363738393a434445464748494a535455565758595a63" +
    "6465666768696a737475767778797a838485868788898a9293949596979899" +
    "9aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7" +
    "d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f01000301010101" +
    "01010101010000000000000102030405060708090a0bffc400b51100020102040403" +
    "040705040400010277000102031104052131061241510761711322328108144291a1" +
    "b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a43" +
    "4445464748494a535455565758595a636465666768696a737475767778797a828384" +
    "85868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2" +
    "c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9" +
    "faffda000c03010002110311003f00ea749f0a691fd9f1ff00a3d14515d956b54e77" +
    "ef3fbce8c0e22afd5a9fbcf65d59ffd9"

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden JPEG bytes decode via the JDK codec to pinned pixel means") {
    val m = MediaCodecs.decodeImage(hexBytes(goldenJpegHex)).get
    assert(m.format == "jpeg" && m.width == 4 && m.height == 4)
    assert(m.meanR == 113.3125 && m.meanG == 121.8125 && m.meanB == 200.8125)
    // decoding is a pure function of the bytes
    assert(MediaCodecs.decodeImage(hexBytes(goldenJpegHex)).get == m)
  }

  test("PNG encode/decode round-trip is lossless") {
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3)
      img.setRGB(x, y, ((x * 80) << 16) | ((y * 100) << 8) | 40)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val m = MediaCodecs.decodeImage(bos.toByteArray).get
    assert(m.format == "png" && m.width == 3 && m.height == 2)
    assert(m.meanR == (0 + 80 + 160) * 2 / 6.0)
    assert(m.meanG == (0 + 100) * 3 / 6.0)
    assert(m.meanB == 40.0)
  }

  test("decodeImage rejects corrupt streams and foreign magics") {
    // JPEG magic followed by garbage -> decoder fails -> None
    assert(MediaCodecs.decodeImage(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
        Array.fill[Byte](200)(0)).isEmpty)
    // MP3-ish magic (ID3 tag): no JDK codec -> None (stays an honest stub)
    assert(MediaCodecs.decodeImage("ID3abcdefgh".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodecs.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("decodeMedia tags JPEG payloads with the real imageio path (Spark)") {
    val recs = Seq(
      Multimodal.MediaRecord(10L, "image", hexBytes(goldenJpegHex)),
      Multimodal.MediaRecord(11L, "audio", "ID3andthensomegarbage".getBytes("US-ASCII"))
    ).toDS()
    val out = Multimodal.decodeMedia(recs).collect().map(d => d.media_id -> d).toMap
    assert(out(10L).decoder == "jpeg" && out(10L).width == 4 &&
      out(10L).height == 4 && out(10L).mean_b == 200.8125)
    assert(out(11L).decoder == "stub")
  }

  test("encodeBmpGray round-trips through decodeBmp and thumbnail") {
    val gray = Array.tabulate(64)(i => (i * 4) % 256)
    val bytes = MediaCodecs.encodeBmpGray8(gray)
    val meta = MediaCodecs.decodeBmp(bytes).get
    assert(meta.width == 8 && meta.height == 8 && meta.bitsPerPixel == 24)
    // r=g=b=gray, so all channel means equal the gray mean
    val mean = gray.sum / 64.0
    assert(meta.meanR == mean && meta.meanG == mean && meta.meanB == mean)
    // top-down order is preserved through the thumbnail path
    val t = MediaCodecs.bmpThumbnail(bytes, 8).get
    assert(t.length == 192)
    (0 until 64).foreach { i =>
      assert((t(i * 3) & 0xff) == gray(i), s"pixel $i")
    }
    assert(MediaCodecs.encodeBmpGray8(Array.fill(63)(0)) == null)
  }

  test("aHash64: bit i set iff pixel i strictly above the mean") {
    // Half the pixels at 200, half at 100 -> mean 150: bits 0..31 set.
    val gray = Array.tabulate(64)(i => if (i < 32) 200 else 100)
    val h = MediaCodecs.aHash64(MediaCodecs.encodeBmpGray8(gray))
    assert(h != null && h.longValue() == 0x00000000ffffffffL)
    // All-equal image: no pixel is strictly above the mean -> 0
    val flat = MediaCodecs.aHash64(MediaCodecs.encodeBmpGray8(Array.fill(64)(7)))
    assert(flat != null && flat.longValue() == 0L)
    // Not a BMP -> null, undersized image -> null
    assert(MediaCodecs.aHash64("junk".getBytes("US-ASCII")) == null)
    assert(MediaCodecs.aHash64(bmpBytes(4, 2, 9, 8, 7)) == null)
  }

  test("imageNearDupPairs: same-class images pair, far images don't") {
    // Docs 0,1: differ in one pixel -> tiny hamming; doc 2: inverted.
    def img(base: Int, noise: Int) = Array.tabulate(64)(i =>
      if (i == 0) noise else if (i % 2 == 0) 220 else 30 + base)
    val media = Seq(
      (0L, MediaCodecs.encodeBmpGray8(img(0, 250))),
      (1L, MediaCodecs.encodeBmpGray8(img(0, 240))),
      (2L, MediaCodecs.encodeBmpGray8(Array.tabulate(64)(i =>
        if (i % 2 == 0) 30 else 220))),
      (3L, "notabmp".getBytes("US-ASCII")) // hash NULL: must drop out
    ).toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(media, "media_id", "payload",
        maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(pairs.head._3 <= 1L)
  }

  test("imageNearDupPairs: per-bucket cap bounds a hot cluster but keeps it connected") {
    // 20 identical images = one hot bucket per band; uncapped emits all
    // 190 pairs, cap=3 keeps ids (0,1,2) per bucket -> 3 pairs — but the
    // survivors still link the bucket minimum, so a CC pass would still
    // merge every capped member that appears in ANY surviving pair.
    def img = Array.tabulate(64)(i => if (i % 2 == 0) 220 else 30)
    val media = (0L until 20L).map(id => (id, MediaCodecs.encodeBmpGray8(img)))
      .toDF("media_id", "payload")
    val uncapped = Multimodal.imageNearDupPairs(media, "media_id", "payload",
      maxHamming = 10).count()
    assert(uncapped == 190L)
    val capped = Multimodal.imageNearDupPairs(media, "media_id", "payload",
        maxHamming = 10, maxPerBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("encodePngGray: real PNG, losslessly decoded by the JDK codec") {
    val gray = Array.tabulate(64)(i => (i * 37 + 5) % 256)
    val bytes = MediaCodecs.encodePngGray8(gray)
    // valid signature + decodes with the standard codec
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 8 && img.getHeight == 8)
    // RAW raster samples equal the encoded pixels exactly (losslessness
    // is what makes the q200 oracle replayable)
    val raster = img.getRaster
    for (y <- 0 until 8; x <- 0 until 8)
      assert(raster.getSample(x, y, 0) == gray(y * 8 + x), s"pixel ($x,$y)")
    // non-square variant + clamping
    val wide = MediaCodecs.encodePngGray(3, 2, Array(300, -5, 0, 255, 17, 128))
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(wide))
    assert(img2.getWidth == 3 && img2.getHeight == 2)
    assert(img2.getRaster.getSample(0, 0, 0) == 255) // clamped
    assert(img2.getRaster.getSample(1, 0, 0) == 0)   // clamped
    assert(img2.getRaster.getSample(1, 1, 0) == 17)
    // invalid sizes -> null, not exceptions
    assert(MediaCodecs.encodePngGray8(Array.fill(63)(0)) == null)
    assert(MediaCodecs.encodePngGray(2, 2, Array(1, 2, 3)) == null)
  }

  test("imgAHash64: same bits as the BMP aHash on identical gray pixels") {
    val gray = Array.tabulate(64)(i => (i * 41 + 3) % 256)
    val png = MediaCodecs.imgAHash64(MediaCodecs.encodePngGray8(gray))
    val bmp = MediaCodecs.aHash64(MediaCodecs.encodeBmpGray8(gray))
    // PNG is lossless and the raster read skips color management, so the
    // two production paths agree bit-for-bit on the same image
    assert(png != null && bmp != null && png.longValue() == bmp.longValue())
    // and both match the plain arithmetic the oracle replays
    val s = gray.map(_.toLong).sum
    var expected = 0L
    (0 until 64).foreach(i => if (64L * gray(i) > s) expected |= 1L << i)
    assert(png.longValue() == expected)
    // rejects: BMP bytes (wrong magic), corrupt PNG, sub-8x8, null
    assert(MediaCodecs.imgAHash64(MediaCodecs.encodeBmpGray8(gray)) == null)
    assert(MediaCodecs.imgAHash64(
      MediaCodecs.encodePngGray8(gray).take(30)) == null)
    assert(MediaCodecs.imgAHash64(
      MediaCodecs.encodePngGray(4, 4, Array.fill(16)(9))) == null)
    assert(MediaCodecs.imgAHash64(null) == null)
  }

  test("compressedImageNearDupPairs: near PNGs pair, far and undecodable don't") {
    def img(base: Int, noise: Int) = Array.tabulate(64)(i =>
      if (i == 0) noise else if (i % 2 == 0) 220 else 30 + base)
    val media = Seq(
      (0L, MediaCodecs.encodePngGray8(img(0, 250))),
      (1L, MediaCodecs.encodePngGray8(img(0, 240))),
      (2L, MediaCodecs.encodePngGray8(Array.tabulate(64)(i =>
        if (i % 2 == 0) 30 else 220))),
      (3L, "notapng".getBytes("US-ASCII")) // hash NULL: must drop out
    ).toDF("media_id", "payload")
    val pairs = Multimodal.compressedImageNearDupPairs(
        media, "media_id", "payload", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    assert(pairs.head._3 <= 1L)
  }

  test("encodeWavPcm8 round-trips through decodeWav with exact features") {
    // 8-bit unsigned: 128 = silence; 0/255 = full scale
    val samples = Array(128, 128, 255, 0, 192, 64, 128, 128)
    val bytes = MediaCodecs.encodeWavPcm8(samples, 8000)
    val m = MediaCodecs.decodeWav(bytes).get
    assert(m.channels == 1 && m.sampleRate == 8000 && m.bitsPerSample == 8)
    assert(m.nSamples == 8L)
    assert(m.peak == 1.0) // sample 0 -> (0-128)/128 = -1, abs
    assert(MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm8(
      Array(128, 255), 8000)).get.peak == 127.0 / 128.0)
    // invalid inputs -> null, not exceptions
    assert(MediaCodecs.encodeWavPcm8(Array.emptyIntArray, 8000) == null)
    assert(MediaCodecs.encodeWavPcm8(null, 8000) == null)
    assert(MediaCodecs.encodeWavPcm8(Array(1), 0) == null)
    // odd-length data chunk pads to even and still decodes
    assert(MediaCodecs.decodeWav(
      MediaCodecs.encodeWavPcm8(Array(1, 2, 3), 8000)).get.nSamples == 3L)
  }

  test("energyHash64: bit j set iff frame j strictly above the mean energy") {
    // 128 samples -> 64 frames of 2; loud frames (j % 3 == 0) carry
    // +/-100, quiet ones +/-2: the hand-computed mask is exact
    val samples = Array.tabulate(128) { i =>
      val j = i / 2
      val amp = if (j % 3 == 0) 100 else 2
      128 + (if (i % 2 == 0) amp else -amp)
    }
    val h = MediaCodecs.energyHash64(MediaCodecs.encodeWavPcm8(samples, 8000))
    assert(h != null)
    var expected = 0L
    val e = Array.tabulate(64)(j => if (j % 3 == 0) 2L * 100 * 100 else 2L * 4)
    val s = e.sum
    (0 until 64).foreach(j => if (64L * e(j) > s) expected |= 1L << j)
    assert(h.longValue() == expected)
    // the loud mask is exactly the j % 3 == 0 frames
    assert(java.lang.Long.bitCount(expected) == 22)
  }

  test("energyHash64: 16-bit path centers on short div 256, same scale as 8-bit") {
    // 16-bit samples chosen so v/256 reproduces the 8-bit centered values
    val centered8 = Array.tabulate(128) { i =>
      val amp = if ((i / 2) % 5 == 0) 90 else 3
      if (i % 2 == 0) amp else -amp
    }
    val bytes16 = wavBytes(centered8.map(v => (v * 256).toShort), 8000)
    val bytes8 = MediaCodecs.encodeWavPcm8(centered8.map(_ + 128), 8000)
    val h16 = MediaCodecs.energyHash64(bytes16)
    val h8 = MediaCodecs.energyHash64(bytes8)
    assert(h16 != null && h8 != null && h16.longValue() == h8.longValue())
  }

  test("energyHash64 rejects garbage, short clips, and non-PCM payloads") {
    assert(MediaCodecs.energyHash64(null) == null)
    assert(MediaCodecs.energyHash64(Array.fill[Byte](100)(7)) == null)
    // 63 samples -> an empty frame -> null
    assert(MediaCodecs.energyHash64(
      MediaCodecs.encodeWavPcm8(Array.fill(63)(130), 8000)) == null)
    // 64 samples is the minimum
    assert(MediaCodecs.energyHash64(
      MediaCodecs.encodeWavPcm8(Array.tabulate(64)(i => 120 + i % 16), 8000)) != null)
    // a BMP is not a WAV
    assert(MediaCodecs.energyHash64(bmpBytes(4, 2, 9, 8, 7)) == null)
  }

  test("wavEnergyHash expression equals the codec on the Spark path") {
    val df = Seq(
      (1L, Array.tabulate(256)(i => 128 + (if ((i / 4) % 2 == 0) 90 else -3))),
      (2L, Array.tabulate(16)(_ => 128)), // too short -> null hash
      (3L, null.asInstanceOf[Array[Int]])) // null samples -> null payload
      .toDF("id", "samples")
    val out = df.select($"id",
        Multimodal.wavEnergyHash(Multimodal.encodeWavPcm8($"samples")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = MediaCodecs.energyHash64(MediaCodecs.encodeWavPcm8(
      Array.tabulate(256)(i => 128 + (if ((i / 4) % 2 == 0) 90 else -3)), 8000))
    assert(out(1L).contains(expected.longValue()))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("audioNearDupPairs: same-envelope clips pair, different envelopes don't") {
    def clip(loudMask: Int => Boolean, tweak: Int): Array[Int] =
      Array.tabulate(256) { i =>
        val amp = if (loudMask(i / 4)) 96 else 8
        128 + (if (i % 2 == 0) amp else -amp) + (if (i < 4) tweak else 0)
      }
    val a = (j: Int) => j % 2 == 0
    val b = (j: Int) => j % 5 < 2 // a genuinely different contour
    val media = Seq(
      (0L, clip(a, 0)), (1L, clip(a, 7)), (2L, clip(a, 13)), (3L, clip(b, 0)))
      .toDF("media_id", "samples")
      .select($"media_id", Multimodal.encodeWavPcm8($"samples").as("payload"))
    val got = Multimodal.audioNearDupPairs(media, "media_id", "payload",
        maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L)))
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
