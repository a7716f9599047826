package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM decoders for the multimodal column conventions (SURVEY.md §2
  * B18). Three genuinely-implemented tiers:
  *   - RIFF/WAV PCM and BMP: byte-layout formats, hand-parsed — no
  *     library at all;
  *   - JPEG and PNG: decoded via the JDK's own `javax.imageio` codecs
  *     (part of every standard JDK, headless-safe — verified working in
  *     this container), so "compressed image" is a REAL decode path;
  *   - MP3/H.264 and other A/V codecs: still behind the honest stub
  *     ([[graft.operators.Multimodal.fakeDecode]]) — the JDK ships no
  *     decoder for them and the container has no codec libs.
  *
  * Everything here is a pure function of the payload bytes — safe inside
  * `mapPartitions` with zero per-row setup, deterministic across runs
  * (a fixed JDK decodes fixed bytes to fixed pixels).
  */
object MediaCodecs {

  /** Decoded PCM WAV: header fields + whole-signal features. */
  final case class WavMeta(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, durationMs: Double,
      rms: Double, peak: Double)

  /** Decoded BMP: dimensions + mean channel values (feature extraction). */
  final case class BmpMeta(
      width: Int, height: Int, bitsPerPixel: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Decoded compressed image (JPEG/PNG via the JDK codec): format tag,
    * dimensions, mean channel values.
    */
  final case class ImgMeta(
      format: String, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  private def le(b: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)

  private def ascii(b: Array[Byte], off: Int, n: Int): String =
    if (off + n <= b.length) new String(b, off, n, "US-ASCII") else ""

  /** Parse a RIFF/WAVE PCM payload; None when the bytes are not a
    * well-formed PCM WAV (wrong magic, truncated chunks, non-PCM format).
    */
  def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 44 || ascii(bytes, 0, 4) != "RIFF" ||
      ascii(bytes, 8, 4) != "WAVE") return None
    val buf = le(bytes)
    var pos = 12
    var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    // chunk walk: id(4) size(4 LE) payload(size, padded to even)
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels == 0)) {
      val id = ascii(bytes, pos, 4)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8) & 0xffff
          if (audioFormat != 1) return None // PCM only
          channels = buf.getShort(pos + 10) & 0xffff
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22) & 0xffff
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || dataOff < 0 ||
      (bits != 8 && bits != 16)) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    if (frameBytes == 0) return None
    val nFrames = dataLen / frameBytes
    // features over all samples (channel-interleaved): RMS + peak,
    // normalized to [-1, 1]
    var sumSq = 0.0
    var peak = 0.0
    var i = 0
    val totalSamples = nFrames * channels
    while (i < totalSamples) {
      val v =
        if (bits == 16) buf.getShort(dataOff + i * 2).toDouble / 32768.0
        else ((bytes(dataOff + i) & 0xff) - 128).toDouble / 128.0
      sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    val rms = if (totalSamples == 0) 0.0 else math.sqrt(sumSq / totalSamples)
    Some(WavMeta(channels, sampleRate, bits, nFrames,
      nFrames * 1000.0 / sampleRate, rms, peak))
  }

  /** Parse an uncompressed 24/32-bpp BMP; None otherwise. */
  def decodeBmp(bytes: Array[Byte]): Option[BmpMeta] = {
    if (bytes.length < 54 || ascii(bytes, 0, 2) != "BM") return None
    val buf = le(bytes)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val heightRaw = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (width <= 0 || heightRaw == 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val height = math.abs(heightRaw)
    val bytesPerPx = bpp / 8
    val rowBytes = ((width * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOffset < 0 || dataOffset.toLong + rowBytes.toLong * height > bytes.length)
      return None
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < height) {
      val row = dataOffset + y * rowBytes
      var x = 0
      while (x < width) {
        val p = row + x * bytesPerPx // layout is B, G, R [, A]
        sb += (bytes(p) & 0xff)
        sg += (bytes(p + 1) & 0xff)
        sr += (bytes(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = width.toDouble * height
    Some(BmpMeta(width, height, bpp, sr / n, sg / n, sb / n))
  }

  // javax.imageio needs no display, but force headless up front so a
  // misconfigured DISPLAY env can never make executor JVMs try X11
  private lazy val headless: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
  }

  private def looksJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  private def looksPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  /** Decode a JPEG or PNG payload with the JDK's built-in `javax.imageio`
    * codec; None when the magic bytes match neither format or the stream
    * is corrupt. Deterministic: a fixed JDK decodes fixed bytes to fixed
    * pixels (golden-byte case in MediaCodecsSpec).
    */
  def decodeImage(bytes: Array[Byte]): Option[ImgMeta] = {
    val fmt =
      if (looksJpeg(bytes)) "jpeg"
      else if (looksPng(bytes)) "png"
      else return None
    headless
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        var (sr, sg, sb2) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb2 += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = img.getWidth.toDouble * img.getHeight
        Some(ImgMeta(fmt, img.getWidth, img.getHeight, sr / n, sg / n, sb2 / n))
      }
    } catch { case _: Exception => None }
  }

  /** Nearest-neighbor downscale of a decoded BMP to at most
    * `maxSide` x `maxSide`, returned as packed RGB triples row-major
    * top-down — the "resize" stage of a thumbnailing pipeline, and the
    * shape an embedding model's preprocessor consumes.
    */
  def bmpThumbnail(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    decodeBmp(bytes).map { m =>
      val buf = le(bytes)
      val dataOffset = buf.getInt(10)
      val heightRaw = buf.getInt(22)
      val bottomUp = heightRaw > 0
      val bytesPerPx = m.bitsPerPixel / 8
      val rowBytes = ((m.width * bytesPerPx + 3) / 4) * 4
      val ow = math.min(maxSide, m.width)
      val oh = math.min(maxSide, m.height)
      val out = new Array[Byte](ow * oh * 3)
      var oy = 0
      while (oy < oh) {
        val sy = (oy.toLong * m.height / oh).toInt
        val fileRow = if (bottomUp) m.height - 1 - sy else sy
        var ox = 0
        while (ox < ow) {
          val sx = (ox.toLong * m.width / ow).toInt
          val p = dataOffset + fileRow * rowBytes + sx * bytesPerPx
          val o = (oy * ow + ox) * 3
          out(o) = bytes(p + 2)     // R
          out(o + 1) = bytes(p + 1) // G
          out(o + 2) = bytes(p)     // B
          ox += 1
        }
        oy += 1
      }
      out
    }

  /** Encode a grayscale image as a 24-bpp uncompressed BMP (r=g=b).
    * Stored TOP-DOWN (negative height in the info header — standard BMP,
    * round-trips through [[decodeBmp]]/[[bmpThumbnail]]), rows padded to
    * 4 bytes. `gray` is row-major top-down, values clamped 0..255.
    * Returns null (not an exception) on a size mismatch so the Catalyst
    * expression wrapper can surface SQL NULL.
    */
  def encodeBmpGray(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    if (gray == null || w <= 0 || h <= 0 || gray.length != w * h) return null
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    val buf = le(out)
    out(0) = 'B'; out(1) = 'M'
    buf.putInt(2, size)
    buf.putInt(10, 54) // pixel data offset
    buf.putInt(14, 40) // BITMAPINFOHEADER
    buf.putInt(18, w)
    buf.putInt(22, -h) // negative = top-down
    buf.putShort(26, 1.toShort) // planes
    buf.putShort(28, 24.toShort) // bpp
    buf.putInt(30, 0) // BI_RGB
    buf.putInt(34, rowBytes * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = math.max(0, math.min(255, gray(y * w + x))).toByte
        val p = 54 + y * rowBytes + x * 3
        out(p) = g; out(p + 1) = g; out(p + 2) = g // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64 entries -> an 8x8 grayscale BMP; null otherwise. */
  def encodeBmpGray8(gray: Array[Int]): Array[Byte] =
    if (gray == null || gray.length != 64) null else encodeBmpGray(8, 8, gray)

  /** Encode a grayscale image as a REAL PNG (8-bit grayscale, color type
    * 0): signature + IHDR + one zlib-deflated IDAT of filter-0 scanlines
    * + IEND, CRCs included — decodes with any compliant codec (pinned
    * against the JDK's in MediaCodecsSpec). PNG is lossless, so the
    * decoded raster equals `gray` EXACTLY — which is what lets the q200
    * oracle replay the downstream hash arithmetically. `gray` is
    * row-major top-down, values clamped 0..255. Null (not an exception)
    * on a size mismatch so the expression wrapper can surface SQL NULL.
    */
  def encodePngGray(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    if (gray == null || w <= 0 || h <= 0 || gray.length != w * h) return null
    // raw image stream: per scanline, filter byte 0 + w samples
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) =
          math.max(0, math.min(255, gray(y * w + x))).toByte
        x += 1
      }
      y += 1
    }
    // zlib worst case (incompressible input falls back to stored
    // blocks): raw + 5 bytes per 64 KB block + 6 bytes framing — sized
    // correctly so ANY raster fits, not just tiny ones
    val deflater = new java.util.zip.Deflater()
    val zBuf = new Array[Byte](raw.length + (raw.length / 65535 + 1) * 5 + 16)
    var zLen = 0
    try {
      deflater.setInput(raw); deflater.finish()
      while (!deflater.finished()) {
        val n = deflater.deflate(zBuf, zLen, zBuf.length - zLen)
        require(n > 0 || deflater.finished(), "deflate stalled")
        zLen += n
      }
    } finally deflater.end() // native zlib memory must release on ANY exit
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val be = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      out.write(be.putInt(0, data.length).array(), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
        .putInt(0, crc.getValue.toInt).array(), 0, 4)
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(0.toByte)  // color type 0 = grayscale
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
    chunk("IHDR", ihdr.array())
    chunk("IDAT", java.util.Arrays.copyOf(zBuf, zLen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 64 entries -> an 8x8 grayscale PNG; null otherwise. */
  def encodePngGray8(gray: Array[Int]): Array[Byte] =
    if (gray == null || gray.length != 64) null else encodePngGray(8, 8, gray)

  /** Average-hash of a COMPRESSED image payload (JPEG/PNG via the JDK
    * codec) — [[aHash64]]'s twin for the formats a web crawl actually
    * contains. Reads RAW raster samples (no getRGB: that route applies
    * gray→sRGB color management, which would make the bits
    * JDK-color-profile-dependent): per pixel the channel sum over the
    * first 3 bands (1-band gray counts ×3 — the same r=g=b scale as the
    * BMP path, and the mean threshold is scale-invariant anyway), then
    * nearest-neighbor to 8x8 with the [[bmpThumbnail]] index map and the
    * same `64·g_i > Σg` bit rule. For a LOSSLESS 8x8 gray PNG this is
    * exactly the aHash of the encoded pixels — arithmetically replayable
    * by the q200 oracle. Null for undecodable payloads or images smaller
    * than 8x8.
    */
  def imgAHash64(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || !(looksJpeg(bytes) || looksPng(bytes))) return null
    headless
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) return null
      val raster = img.getRaster
      // color bands only — 1 band = gray, 2 = gray+ALPHA, 3 = RGB,
      // 4 = RGB+alpha: alpha must never leak into the luminance hash
      // (a transparency mask would flip bits on two visually identical
      // images), so <3 bands reads band 0 alone and scales to the
      // r+g+b range
      val nb = if (raster.getNumBands >= 3) 3 else 1
      val g = new Array[Long](64)
      var s = 0L
      var oy = 0
      while (oy < 8) {
        val sy = (oy.toLong * img.getHeight / 8).toInt
        var ox = 0
        while (ox < 8) {
          val sx = (ox.toLong * img.getWidth / 8).toInt
          var acc = 0L
          var b = 0
          while (b < nb) { acc += raster.getSample(sx, sy, b); b += 1 }
          if (nb == 1) acc *= 3 // gray on the r+g+b scale
          g(oy * 8 + ox) = acc
          s += acc
          ox += 1
        }
        oy += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        if (64L * g(i) > s) h |= 1L << i
        i += 1
      }
      java.lang.Long.valueOf(h)
    } catch { case _: Exception => null }
  }

  /** Average-hash (aHash) of a BMP payload: decode, nearest-neighbor to
    * 8x8 (via [[bmpThumbnail]] — identity for 8x8 inputs), then bit i
    * (row-major top-down, i = y*8+x) is set iff pixel i's channel sum is
    * strictly above the image mean. Integer-exact: the comparison is
    * `64 * (r+g+b)_i > sum of all (r+g+b)` — no division, so the DuckDB
    * oracle replays it bit-for-bit. Null (boxed) for non-BMP payloads or
    * images smaller than 8x8 — the codegen wrapper maps it to SQL NULL.
    */
  /** Mono 8-bit PCM RIFF/WAVE payload from raw samples (values clamped
    * 0..255 — the unsigned 8-bit PCM convention). Round-trips through
    * [[decodeWav]]. Null (not an exception) on empty/absent samples or a
    * non-positive rate, so the expression wrapper can surface SQL NULL.
    */
  def encodeWavPcm8(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    if (samples == null || samples.length == 0 || sampleRate <= 0) return null
    val n = samples.length
    val size = 44 + n + (n & 1) // data chunk padded to even
    val out = new Array[Byte](size)
    val buf = le(out)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    buf.putInt(4, size - 8)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    buf.putInt(16, 16) // fmt chunk size
    buf.putShort(20, 1.toShort) // PCM
    buf.putShort(22, 1.toShort) // mono
    buf.putInt(24, sampleRate)
    buf.putInt(28, sampleRate) // byte rate = rate * 1 ch * 1 byte
    buf.putShort(32, 1.toShort) // block align
    buf.putShort(34, 8.toShort) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    buf.putInt(40, n)
    var i = 0
    while (i < n) {
      out(44 + i) = math.max(0, math.min(255, samples(i))).toByte
      i += 1
    }
    out
  }

  /** Frame-energy hash (the audio analogue of [[aHash64]]): decode a
    * PCM WAV, split the interleaved sample stream into 64 equal frames
    * (integer boundaries j·n div 64), per-frame energy = Σ v² over
    * CENTERED integer samples (8-bit: (b&0xff)−128; 16-bit: the raw
    * short div 256, so both widths land on the same ±128 scale), and
    * bit j is set iff `64 · e_j > Σ e` — the aHash mean threshold, no
    * division, replayable bit-for-bit by the oracle. Loudness contour
    * is what survives re-encoding and small edits, which is exactly the
    * jingle/silence/duplicate-clip signal an audio ingest gate needs.
    * Null for undecodable payloads or clips shorter than 64 samples
    * (a frame would be empty).
    */
  def energyHash64(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || decodeWav(bytes).isEmpty) return null
    // re-walk the verified chunks for the raw samples
    val buf = le(bytes)
    var pos = 12
    var bits = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels == 0)) {
      val id = ascii(bytes, pos, 4)
      val size = buf.getInt(pos + 4)
      id match {
        case "fmt " =>
          channels = buf.getShort(pos + 10) & 0xffff
          bits = buf.getShort(pos + 22) & 0xffff
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    val bytesPerSample = bits / 8
    val n = dataLen / bytesPerSample // interleaved sample count
    if (n < 64) return null
    val e = new Array[Long](64)
    var s = 0L
    var j = 0
    while (j < 64) {
      val from = (j.toLong * n / 64).toInt
      val to = ((j + 1).toLong * n / 64).toInt
      var i = from
      var acc = 0L
      while (i < to) {
        val v: Long =
          if (bits == 16) (buf.getShort(dataOff + i * 2) / 256).toLong
          else ((bytes(dataOff + i) & 0xff) - 128).toLong
        acc += v * v
        i += 1
      }
      e(j) = acc
      s += acc
      j += 1
    }
    var h = 0L
    j = 0
    while (j < 64) {
      if (64L * e(j) > s) h |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(h)
  }

  def aHash64(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) return null
    bmpThumbnail(bytes, 8) match {
      case Some(t) if t.length == 8 * 8 * 3 =>
        val g = new Array[Long](64)
        var s = 0L
        var i = 0
        while (i < 64) {
          g(i) = (t(i * 3) & 0xff) + (t(i * 3 + 1) & 0xff) + (t(i * 3 + 2) & 0xff)
          s += g(i)
          i += 1
        }
        var h = 0L
        i = 0
        while (i < 64) {
          if (64L * g(i) > s) h |= 1L << i
          i += 1
        }
        java.lang.Long.valueOf(h)
      case _ => null
    }
  }
}
