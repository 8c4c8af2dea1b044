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

  test("extractFeaturesDecoded: real decode for bmp/wav, observable stub fallback") {
    import spark.implicits._
    val media = Multimodal.synthEncoded(spark, 30, seed = 7L)
    val out = Multimodal.extractFeaturesDecoded(media, dim = 16).collect()
    assert(out.length == 30)
    val byFormat = out.groupBy(_.format)
    // every bmp and wav row decoded for real; every mp4 fell back, flagged
    assert(byFormat("bmp").forall(_.decoded))
    assert(byFormat("wav").forall(_.decoded))
    assert(byFormat("mp4").forall(!_.decoded))
    // decoded image features carry real channel means (bounded 0..255)
    assert(byFormat("bmp").forall(f => f.features(0) >= 0f && f.features(0) <= 255f))
    // a corrupted bmp payload flips to the flagged fallback, job survives
    val corrupted = media.map(m =>
      if (m.format == "bmp") m.copy(payload = m.payload.take(20)) else m)
    val out2 = Multimodal.extractFeaturesDecoded(corrupted, dim = 16).collect()
    assert(out2.filter(_.format == "bmp").forall(!_.decoded))
  }
}
