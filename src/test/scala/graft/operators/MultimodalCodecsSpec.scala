package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import MultimodalCodecs._

class MultimodalCodecsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def gradient(w: Int, h: Int): BmpImage = {
    val rgb = Array.tabulate(w * h * 3) { i => ((i * 7) % 256).toByte }
    BmpImage(w, h, rgb)
  }

  test("BMP round-trip is pixel-exact, including padded odd widths") {
    for (w <- Seq(1, 3, 5, 8); h <- Seq(1, 2, 7)) {
      val img = gradient(w, h)
      val back = decodeBmp(encodeBmp(img)).get
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(img.rgb), s"pixels differ at ${w}x$h")
    }
  }

  test("BMP decoder rejects foreign and torn payloads") {
    assert(decodeBmp(Array[Byte](1, 2, 3)).isEmpty)
    assert(decodeBmp("RIFF....WAVE".getBytes ++ new Array[Byte](64)).isEmpty)
    val ok = encodeBmp(gradient(6, 4))
    assert(decodeBmp(ok.take(ok.length - 10)).isEmpty) // truncated pixel data
    val bpp8 = ok.clone(); bpp8(28) = 8 // not 24-bpp
    assert(decodeBmp(bpp8).isEmpty)
  }

  test("resize: identity at same size, nearest-neighbor at 2x down") {
    val img = gradient(8, 8)
    assert(resize(img, 8, 8).rgb.sameElements(img.rgb))
    val half = resize(img, 4, 4)
    // pixel (x,y) of the half image is source pixel (2x, 2y)
    for (x <- 0 until 4; y <- 0 until 4)
      assert(half.pixel(x, y) == img.pixel(2 * x, 2 * y))
  }

  test("WAV round-trip is sample-exact and tolerates extra chunks") {
    val audio = WavAudio(8000, 1, Array.tabulate(500)(t => (t * 13 - 3000).toShort))
    val back = decodeWav(encodeWav(audio)).get
    assert(back.sampleRate == 8000 && back.channels == 1)
    assert(back.samples.sameElements(audio.samples))
    // splice a LIST chunk between fmt and data: chunk walker must skip it
    val enc = encodeWav(audio)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = enc.take(36) ++ listChunk ++ enc.drop(36)
    // fix RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(decodeWav(spliced).get.samples.sameElements(audio.samples))
  }

  test("WAV decoder rejects compressed/8-bit/foreign payloads") {
    assert(decodeWav(new Array[Byte](10)).isEmpty)
    val enc = encodeWav(WavAudio(8000, 1, Array.tabulate(16)(_.toShort)))
    val nonPcm = enc.clone(); nonPcm(20) = 3 // IEEE float fmt code
    assert(decodeWav(nonPcm).isEmpty)
    val eightBit = enc.clone(); eightBit(34) = 8
    assert(decodeWav(eightBit).isEmpty)
  }

  test("features are deterministic and content-sensitive") {
    val img = gradient(16, 16)
    val f1 = bmpFeatures(img, 16)
    assert(f1.sameElements(bmpFeatures(img, 16)))
    assert(!f1.sameElements(bmpFeatures(gradient(16, 15), 16)))
    // a solid red image has mean R=255, G=B=0, all luma in one bin
    val red = BmpImage(4, 4, Array.tabulate(48)(i => if (i % 3 == 0) 255.toByte else 0.toByte))
    val fr = bmpFeatures(red, 16)
    assert(fr(0) == 255f && fr(1) == 0f && fr(2) == 0f)
    assert(fr.slice(3, 11).sum == 1f)
    // silence has rms 0 and no zero crossings; a tone has both > 0
    val silent = wavFeatures(WavAudio(8000, 1, new Array[Short](100)), 16)
    assert(silent(0) == 0f && silent(1) == 0f)
    val tone = wavFeatures(WavAudio(8000, 1,
      Array.tabulate(100)(t => (math.sin(t / 3.0) * 10000).toShort)), 16)
    assert(tone(0) > 0f && tone(1) > 0f)
  }

  test("PNG round-trip via ImageIO is pixel-exact (lossless by spec)") {
    for (w <- Seq(1, 3, 8, 17); h <- Seq(1, 2, 9)) {
      val img = gradient(w, h)
      val back = decodeImage(encodePng(img)).get
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(img.rgb), s"png pixels differ at ${w}x$h")
    }
  }

  test("hand-built PNG: known bytes decode to the expected pixels") {
    // 2x1 image, pixels (255,0,0) and (0,0,255), built chunk by chunk from
    // the PNG spec (signature, IHDR, IDAT with a deflate-compressed
    // filter-0 scanline, IEND) — no ImageIO writer involved, so this pins
    // the DECODER against the public format spec, not against itself.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(1) // width 2, height 1
      .put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (truecolor)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    val scanline = Array[Byte](0, 255.toByte, 0, 0, 0, 0, 255.toByte) // filter 0 + RGB RGB
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(scanline); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf)
      d.end()
      buf.take(n)
    }
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++ chunk("IEND", Array.empty)
    val img = decodeImage(png).get
    assert(img.width == 2 && img.height == 1)
    assert(img.pixel(0, 0) == ((255, 0, 0)) && img.pixel(1, 0) == ((0, 0, 255)))
  }

  test("GIF round-trip is pixel-exact for <=256-color images") {
    // grayscale ramp: 256 distinct colors max, inside the GIF palette bound
    val w = 16; val h = 8
    val rgb = Array.tabulate(w * h * 3) { i => val g = ((i / 3) * 2 % 256); g.toByte }
    val img = BmpImage(w, h, rgb)
    val back = decodeImage(encodeGif(img)).get
    assert(back.width == w && back.height == h)
    assert(back.rgb.sameElements(img.rgb))
  }

  test("jpeg: feature-grade decode — real pixels within IDCT tolerance, corrupt → stub") {
    import spark.implicits._
    val img = gradient(32, 24)
    val payload = encodeJpeg(img, 0.95f)
    val back = decodeImage(payload).get
    assert(back.width == 32 && back.height == 24)
    // feature-grade, not bit-exact: jpeg is lossy and IDCT rounding is
    // implementation-defined (encodeJpeg scaladoc) — assert the channel
    // means land NEAR the source's, never equality
    val f = bmpFeatures(back, 16)
    val f0 = bmpFeatures(img, 16)
    for (c <- 0 until 3)
      assert(math.abs(f(c) - f0(c)) < 8f, s"channel $c mean drifted: ${f(c)} vs ${f0(c)}")
    // Dataset path: a jpeg row now decodes for real (decoded=true); a torn
    // jpeg payload keeps the observable stub fallback
    val rows = Seq(
      Multimodal.MediaRow("m1", "image", payload, 32, 24, 0, 0L, "jpeg"),
      Multimodal.MediaRow("m2", "image", payload.take(24), 32, 24, 0, 0L, "jpg"))
    val out = Multimodal.extractFeaturesDecoded(rows.toDS(), dim = 16)
      .collect().map(r => r.media_id -> r).toMap
    assert(out("m1").decoded)
    assert(!out("m2").decoded)
  }

  test("decodeImage rejects foreign, torn, and decompression-bomb payloads") {
    assert(decodeImage(Array[Byte](1, 2, 3)).isEmpty)
    assert(decodeImage("not an image at all".getBytes).isEmpty)
    val png = encodePng(gradient(10, 10))
    assert(decodeImage(png.take(30)).isEmpty) // truncated after IHDR
    // a genuine decode above the pixel budget must return None, not allocate
    assert(decodeImage(png, maxPixels = 50).isEmpty)
  }

  test("extractFeaturesDecoded: real decode for bmp/wav/png/gif, observable stub fallback") {
    import spark.implicits._
    val media = Multimodal.synthEncoded(spark, 50, seed = 7L)
    val out = Multimodal.extractFeaturesDecoded(media, dim = 16).collect()
    assert(out.length == 50)
    val byFormat = out.groupBy(_.format)
    assert(byFormat.keySet == Set("bmp", "wav", "mp4", "png", "gif"))
    // every decodable format decoded for real; every mp4 fell back, flagged
    assert(byFormat("bmp").forall(_.decoded))
    assert(byFormat("wav").forall(_.decoded))
    assert(byFormat("png").forall(_.decoded))
    assert(byFormat("gif").forall(_.decoded))
    assert(byFormat("mp4").forall(!_.decoded))
    // decoded image features carry real channel means (bounded 0..255)
    assert(byFormat("bmp").forall(f => f.features(0) >= 0f && f.features(0) <= 255f))
    assert(byFormat("png").forall(f => f.features(0) >= 0f && f.features(0) <= 255f))
    // gif rows are grayscale: mean R == mean G == mean B
    assert(byFormat("gif").forall(f => f.features(0) == f.features(1) &&
      f.features(1) == f.features(2)))
    // a corrupted payload flips to the flagged fallback, job survives
    val corrupted = media.map(m =>
      if (m.format == "bmp" || m.format == "png") m.copy(payload = m.payload.take(20)) else m)
    val out2 = Multimodal.extractFeaturesDecoded(corrupted, dim = 16).collect()
    assert(out2.filter(f => f.format == "bmp" || f.format == "png").forall(!_.decoded))
  }

  test("png/gif payloads in synthEncoded decode back to their planted geometry") {
    import spark.implicits._
    val media = Multimodal.synthEncoded(spark, 20, seed = 3L).collect()
    media.filter(m => m.format == "png" || m.format == "gif").foreach { m =>
      val img = decodeImage(m.payload).get
      assert(img.width == m.width && img.height == m.height,
        s"${m.media_id}: decoded ${img.width}x${img.height}, meta ${m.width}x${m.height}")
    }
  }
}
