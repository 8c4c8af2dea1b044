package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real pure-JVM codecs for the self-describing UNCOMPRESSED media formats
  * (24-bpp BI_RGB BMP, 16-bit PCM WAV) — no native libraries, so they run
  * on any executor as-is. These replace [[Multimodal.decodeStub]] on the
  * formats a JVM can genuinely decode; compressed formats (png/jpeg/mp4)
  * stay behind the documented stub until a codec dependency exists.
  *
  * Both decoders return Option: a torn or foreign payload yields None and
  * the caller falls back / counts the drop — a corrupt blob must never
  * kill a 100 TB scan (same empty-on-failure discipline as the reference's
  * extractor error handling).
  *
  * All byte layouts here are from the public format specifications
  * (BITMAPFILEHEADER/BITMAPINFOHEADER; RIFF/WAVE fmt+data chunks).
  */
object MultimodalCodecs {

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
