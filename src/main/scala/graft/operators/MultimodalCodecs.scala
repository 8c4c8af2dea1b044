package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM codecs for the self-describing media formats the JDK can
  * genuinely decode with zero added dependencies:
  *   - 24-bpp BI_RGB BMP and 16-bit PCM WAV, hand-rolled from the public
  *     byte-layout specs (BITMAPFILEHEADER/BITMAPINFOHEADER; RIFF/WAVE);
  *   - PNG and GIF via `javax.imageio` (r4) — both are LOSSLESS by spec,
  *     so decode is bit-exact pixel recovery and oracle-gateable. JPEG is
  *     deliberately NOT routed here: its decode is implementation-defined
  *     (IDCT rounding varies across JVMs), so it stays behind the
  *     deterministic stub rather than behind a false "decoded" flag.
  * mp4/video containers remain behind [[Multimodal.decodeStub]] (no JVM
  * codec exists).
  *
  * Every decoder returns Option: a torn or foreign payload yields None and
  * the caller falls back / counts the drop — a corrupt blob must never
  * kill a 100 TB scan (same empty-on-failure discipline as the reference's
  * extractor error handling).
  */
object MultimodalCodecs {

  // ImageIO's disk scratch cache is a liability on executors (tmp churn,
  // permissions); in-memory streams are strictly better for blob payloads.
  javax.imageio.ImageIO.setUseCache(false)

  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * width + x) * 3
      ((rgb(o) & 0xff), (rgb(o + 1) & 0xff), (rgb(o + 2) & 0xff))
    }
  }

  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ------------------------------------------------------------------ BMP

  /** Encode RGB top-down rows as a bottom-up 24-bpp BI_RGB BMP. */
  def encodeBmp(img: BmpImage): Array[Byte] = {
    val rowPad = (4 - (img.width * 3) % 4) % 4
    val dataSize = (img.width * 3 + rowPad) * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
    buf.putInt(40).putInt(img.width).putInt(img.height) // BITMAPINFOHEADER
    buf.putShort(1).putShort(24).putInt(0).putInt(dataSize) // planes, bpp, BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    var y = img.height - 1 // BMP rows are bottom-up
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
        x += 1
      }
      var p = 0
      while (p < rowPad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Strict 24-bpp BI_RGB decoder; None on anything else. */
  def decodeBmp(payload: Array[Byte]): Option[BmpImage] = {
    try {
      if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val pixelOffset = buf.getInt(10)
      val width = buf.getInt(18)
      val height = buf.getInt(22)
      val bpp = buf.getShort(28)
      val compression = buf.getInt(30)
      if (bpp != 24 || compression != 0 || width <= 0 || height <= 0) return None
      val rowPad = (4 - (width * 3) % 4) % 4
      val need = pixelOffset.toLong + (width * 3 + rowPad).toLong * height
      if (need > payload.length) return None
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = pixelOffset + (height - 1 - y) * (width * 3 + rowPad)
        var x = 0
        while (x < width) {
          val s = srcRow + x * 3
          val d = (y * width + x) * 3
          rgb(d) = payload(s + 2) // R
          rgb(d + 1) = payload(s + 1) // G
          rgb(d + 2) = payload(s) // B
          x += 1
        }
        y += 1
      }
      Some(BmpImage(width, height, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Nearest-neighbor resize — the `resize` operation of the multimodal op
    * set, deterministic and allocation-bounded.
    */
  def resize(img: BmpImage, newW: Int, newH: Int): BmpImage = {
    require(newW > 0 && newH > 0, "resize target must be positive")
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = (y.toLong * img.height / newH).toInt
      var x = 0
      while (x < newW) {
        val sx = (x.toLong * img.width / newW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    BmpImage(newW, newH, out)
  }

  /** Image features: mean R/G/B + an 8-bin luminance histogram (fractions),
    * zero-padded to `dim`. Integer-derived floats — bit-deterministic.
    */
  def bmpFeatures(img: BmpImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var i = 0
    while (i < n) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      sr += r; sg += g; sb += b
      hist(((r * 299 + g * 587 + b * 114) / 1000) >> 5) += 1
      i += 1
    }
    out(0) = sr.toFloat / n; out(1) = sg.toFloat / n; out(2) = sb.toFloat / n
    var h = 0
    while (h < 8 && 3 + h < dim) { out(3 + h) = hist(h).toFloat / n; h += 1 }
    out
  }

  // ------------------------------------------------------------ PNG / GIF

  /** Encode RGB pixels as PNG — lossless by spec, so
    * `decodeImage(encodePng(img)) == img` bit-for-bit for any input.
    */
  def encodePng(img: BmpImage): Array[Byte] = encodeImageIo(img, "png")

  /** Encode as GIF. GIF palettes hold ≤256 colors: encoding is lossless
    * ONLY for images with ≤256 distinct colors (the Java writer quantizes
    * beyond that). Callers wanting bit-exact roundtrips constrain the
    * palette (e.g. grayscale).
    */
  def encodeGif(img: BmpImage): Array[Byte] = encodeImageIo(img, "gif")

  /** Encode as baseline JPEG (JDK ImageIO writer). LOSSY and — unlike
    * png/gif — its DECODE is only feature-grade: the inverse DCT's rounding
    * is implementation-defined, so recovered pixels can differ by ±1-2 LSB
    * across JVM vendors/versions. Downstream features from jpeg payloads
    * are therefore real but NOT bit-exact-oracle-gateable (r5; the pinned
    * q_media_* digests intentionally contain no jpeg rows).
    */
  def encodeJpeg(img: BmpImage, quality: Float = 0.9f): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](img.width * img.height)
    var i = 0
    while (i < px.length) {
      px(i) = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  private def encodeImageIo(img: BmpImage, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](img.width * img.height)
    var i = 0
    while (i < px.length) {
      px(i) = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    bi.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(bi, format, out)
    require(ok, s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Decode any ImageIO-supported compressed image (PNG, GIF, BMP variants)
    * to top-down RGB. `maxPixels` bounds decompression-bomb blowup: a 100-TB
    * scan must not let one adversarial 30 KB PNG allocate a 4 GB pixel
    * buffer inside an executor — oversized images return None and are
    * counted as fallbacks, never OOM the task.
    */
  def decodeImage(payload: Array[Byte], maxPixels: Long = 64L << 20): Option[BmpImage] = {
    try {
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (bi == null) return None
      val w = bi.getWidth
      val h = bi.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
      // getRGB color-converts any source model (palette, gray, 16-bit) to
      // sRGB ints — exact for PNG/GIF whose storage is already 8-bit RGB(A)
      val px = bi.getRGB(0, 0, w, h, null, 0, w)
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) {
        rgb(i * 3) = ((px(i) >> 16) & 0xff).toByte
        rgb(i * 3 + 1) = ((px(i) >> 8) & 0xff).toByte
        rgb(i * 3 + 2) = (px(i) & 0xff).toByte
        i += 1
      }
      Some(BmpImage(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ------------------------------------------------------------------ WAV

  /** Encode mono/stereo PCM16 as a canonical RIFF/WAVE file. */
  def encodeWav(audio: WavAudio): Array[Byte] = {
    val dataSize = audio.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(audio.channels.toShort) // PCM, channels
    buf.putInt(audio.sampleRate)
    buf.putInt(audio.sampleRate * audio.channels * 2) // byte rate
    buf.putShort((audio.channels * 2).toShort).putShort(16) // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  /** PCM16 RIFF/WAVE decoder (walks chunks — tolerates LIST/extra chunks);
    * None for compressed or non-16-bit audio.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    try {
      if (payload.length < 44) return None
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var rate = 0; var channels = 0; var bits = 0; var fmtCode = 0
      var samples: Array[Short] = null
      while (off + 8 <= payload.length) {
        val id = tag(off)
        val size = buf.getInt(off + 4)
        if (size < 0 || off + 8 + size > payload.length) return None
        id match {
          case "fmt " =>
            fmtCode = buf.getShort(off + 8)
            channels = buf.getShort(off + 10)
            rate = buf.getInt(off + 12)
            bits = buf.getShort(off + 22)
          case "data" =>
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = buf.getShort(off + 8 + i * 2); i += 1 }
          case _ => () // skip LIST/fact/etc.
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (fmtCode != 1 || bits != 16 || rate <= 0 || channels <= 0 || samples == null) None
      else Some(WavAudio(rate, channels, samples))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio features: integer-scaled RMS, zero-crossing fraction, and an
    * 8-bin mean-absolute-energy contour, zero-padded to `dim`.
    */
  def wavFeatures(audio: WavAudio, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val n = audio.samples.length
    if (n == 0) return out
    var sumSq = 0L; var zc = 0L
    val bins = new Array[Long](8)
    var i = 0
    while (i < n) {
      val s = audio.samples(i).toLong
      sumSq += s * s
      if (i > 0 && ((s >= 0) != (audio.samples(i - 1) >= 0))) zc += 1
      bins((i * 8L / n).toInt) += math.abs(s)
      i += 1
    }
    out(0) = math.sqrt(sumSq.toDouble / n).toFloat / 32768f
    out(1) = zc.toFloat / n
    var b = 0
    while (b < 8 && 2 + b < dim) { out(2 + b) = (bins(b) / math.max(1L, n / 8L)).toFloat / 32768f; b += 1 }
    out
  }
}
