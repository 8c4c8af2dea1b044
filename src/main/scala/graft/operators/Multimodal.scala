package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / frame-sample operators run as per-partition
  * batch functions over those bytes.
  *
  * Decoding: 24-bpp BMP, PCM16 WAV (pure-JVM readers) and — via the JDK's
  * own `javax.imageio`, zero added dependencies — PNG and GIF are decoded
  * FOR REAL; [[extractFeaturesDecoded]] routes them to genuine pixel/sample
  * feature extraction with an observable fallback flag. Only formats with
  * no deterministic JVM decode path (jpeg — IDCT is implementation-defined
  * across JVMs; mp4 — no JVM container codec) stay behind the deterministic
  * `decodeStub`; everything around the stub is the
  * real Spark surface a production decoder plugs into: the schema, the
  * mapPartitions batching (one decoder instance per partition, exactly
  * like the extraction stage's pooled model clients), the size-aware
  * repartitioning, and the metadata pushdown (filters on `meta.*` prune at
  * the parquet scan because the struct columns are stored columnar).
  *
  * Scale notes: payload rows are orders of magnitude wider than text rows —
  * partition by target BYTES not row count ([[repartitionBySize]]), keep
  * `spark.sql.files.maxPartitionBytes` at/below executor-memory/cores, and
  * never collect payloads to the driver.
  */
object Multimodal {

  /** One media row. meta fields are nullable per-modality. */
  final case class MediaRow(
      media_id: String,
      modality: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      format: String)

  final case class MediaFeatures(
      media_id: String,
      modality: String,
      n_bytes: Long,
      features: Array[Float])

  final case class Frame(
      media_id: String,
      frame_idx: Int,
      frame_ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Deterministic synthetic media table (seeded; payload sizes and shapes
    * are functions of (seed, i)) — the test stand-in for a real blob-store
    * scan (`spark.read.format("binaryFile")` over an object-store glob).
    */
  def synth(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rng = new scala.util.Random(seed * 1315423911L + i)
      val modality = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val size = 512 + rng.nextInt(4096)
      val payload = new Array[Byte](size)
      rng.nextBytes(payload)
      val (w, h, sr, dur, fmt) = modality match {
        case "image" => (64 + rng.nextInt(512), 64 + rng.nextInt(512), 0, 0L, "png")
        case "audio" => (0, 0, 16000, 1000L + rng.nextInt(60000), "wav")
        case _       => (320, 240, 0, 1000L + rng.nextInt(120000), "mp4")
      }
      MediaRow(f"media_$i%06d", modality, payload, w, h, sr, dur, fmt)
    }
  }

  /** STUB decoder: a real implementation would decode the payload (JPEG →
    * pixels, WAV → PCM) and run a feature extractor; this derives `dim`
    * pseudo-features from a rolling hash of the bytes. Deterministic, pure.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      out((i % dim)) += ((h >>> 40).toInt & 0xffff) / 65535.0f - 0.5f
      i += 1
    }
    out
  }

  /** Feature extraction over the payload column. One decoder per partition
    * (mapPartitions), batch-shaped exactly like a production model runner:
    * the partition iterator IS the batch stream, nothing is materialized.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // a real decoder/model handle would be constructed HERE, once per
      // partition, and closed when the iterator drains
      it.map { m =>
        MediaFeatures(m.media_id, m.modality, m.payload.length.toLong,
          decodeStub(m.payload, dim))
      }
    }
  }

  /** Frame sampling for video rows: every `everyMs` milliseconds take one
    * "frame" (STUB: a fixed-size byte slice at the proportional offset; a
    * real impl seeks the container). flatMap — narrow, no shuffle.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
      frameBytes: Int = 256): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { m =>
      val nFrames = math.max(1L, m.duration_ms / everyMs).toInt
      (0 until nFrames).iterator.map { f =>
        val ts = f.toLong * everyMs
        val off = ((m.payload.length.toLong * f) / math.max(1, nFrames)).toInt
        val end = math.min(m.payload.length, off + frameBytes)
        Frame(m.media_id, f, ts, java.util.Arrays.copyOfRange(m.payload, off, end))
      }
    }
  }

  /** Repartition a payload table to roughly `targetBytes` per partition —
    * row-count partitioning is wrong for binary columns whose sizes vary by
    * 100x. One cheap aggregate to estimate, then a repartition.
    */
  def repartitionBySize(df: DataFrame, payloadCol: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val totalBytes = df.select(sum(length(col(payloadCol)))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Metadata-gated decode: filters on meta columns happen BEFORE the
    * payload is touched, so parquet row-group pruning skips the heavy bytes
    * (verify with .explain: PushedFilters on width/height/modality).
    */
  def decodeImagesAbove(media: Dataset[MediaRow], minW: Int, minH: Int,
      dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    // Column predicates, NOT a typed lambda filter: a typed filter would
    // deserialize every row (payload included) before testing it, defeating
    // the parquet row-group pruning this function exists to exercise.
    extractFeatures(
      media.where(col("modality") === "image" &&
        col("width") >= minW && col("height") >= minH).as[MediaRow],
      dim)
  }

  // ------------------------------------------- real-codec path (bmp/wav)

  final case class DecodedFeatures(
      media_id: String,
      modality: String,
      format: String,
      n_bytes: Long,
      decoded: Boolean, // false = stub fallback (compressed/corrupt payload)
      features: Array[Float])

  /** Deterministic media table whose image/audio payloads are REAL encoded
    * files the pure-JVM codecs can decode: 24-bpp BMP gradients, PCM16 WAV
    * tones, and (r4) PNG gradients + ≤256-color grayscale GIFs via
    * `javax.imageio` — both lossless by spec, so decode is bit-exact.
    * Video rows keep opaque bytes (no JVM container codec).
    */
  def synthEncoded(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    import MultimodalCodecs._
    spark.range(n).map { i =>
      val rng = new scala.util.Random(seed * 2654435761L + i)
      def gradient(w: Int, h: Int): Array[Byte] = {
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < w * h) { // gradient + seeded phase: every image distinct
          rgb(p * 3) = ((p + rng.nextInt(7)) % 256).toByte
          rgb(p * 3 + 1) = ((p * 2) % 256).toByte
          rgb(p * 3 + 2) = ((255 - p) % 256).toByte
          p += 1
        }
        rgb
      }
      (i % 5) match {
        case 0 =>
          val w = 8 + rng.nextInt(25) // odd widths exercise row padding
          val h = 8 + rng.nextInt(25)
          val payload = encodeBmp(BmpImage(w, h, gradient(w, h)))
          MediaRow(f"media_$i%06d", "image", payload, w, h, 0, 0L, "bmp")
        case 1 =>
          val rate = 8000
          val ms = 50L + rng.nextInt(200)
          val freq = 100 + rng.nextInt(900)
          val samples = Array.tabulate((rate * ms / 1000).toInt) { t =>
            (math.sin(2 * math.Pi * freq * t / rate) * 12000).toShort
          }
          val payload = encodeWav(WavAudio(rate, 1, samples))
          MediaRow(f"media_$i%06d", "audio", payload, 0, 0, rate, ms, "wav")
        case 2 =>
          val payload = new Array[Byte](512 + rng.nextInt(2048))
          rng.nextBytes(payload)
          MediaRow(f"media_$i%06d", "video", payload, 320, 240,
            0, 1000L + rng.nextInt(60000), "mp4")
        case 3 =>
          val w = 8 + rng.nextInt(25)
          val h = 8 + rng.nextInt(25)
          val payload = encodePng(BmpImage(w, h, gradient(w, h)))
          MediaRow(f"media_$i%06d", "image", payload, w, h, 0, 0L, "png")
        case _ =>
          // grayscale keeps the palette ≤256 colors: GIF encode is lossless
          val w = 8 + rng.nextInt(25)
          val h = 8 + rng.nextInt(25)
          val rgb = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            val g = ((p * 3 + rng.nextInt(5)) % 256).toByte
            rgb(p * 3) = g; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = g
            p += 1
          }
          val payload = encodeGif(BmpImage(w, h, rgb))
          MediaRow(f"media_$i%06d", "image", payload, w, h, 0, 0L, "gif")
      }
    }
  }

  /** Feature extraction with REAL decoding where the JVM can do it: bmp →
    * [[MultimodalCodecs.decodeBmp]] + color/luma features, wav →
    * [[MultimodalCodecs.decodeWav]] + rms/zcr/energy features, png/gif →
    * [[MultimodalCodecs.decodeImage]] (JDK ImageIO — lossless formats, so
    * pixel recovery is bit-exact and the features oracle-gateable), and
    * (r5) jpeg → the same ImageIO decode at FEATURE grade: real pixels, but
    * the inverse DCT's rounding is implementation-defined, so jpeg features
    * can differ by a few LSB across JVMs — jpeg rows are real data for
    * training-pipeline purposes yet stay OUT of the bit-exact hash oracles
    * (the pinned q_media_* corpus contains none). Only mp4 (no JVM
    * container codec) and corrupt payloads fall back to the hash stub with
    * `decoded = false`, so the fallback RATE is observable, never silent.
    * Same mapPartitions batch shape as [[extractFeatures]].
    */
  def extractFeaturesDecoded(media: Dataset[MediaRow], dim: Int = 64): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    import MultimodalCodecs._
    media.mapPartitions { it =>
      it.map { m =>
        val real: Option[Array[Float]] = m.format match {
          case "bmp" => decodeBmp(m.payload).map(bmpFeatures(_, dim))
          case "wav" => decodeWav(m.payload).map(wavFeatures(_, dim))
          case "png" | "gif" | "jpeg" | "jpg" =>
            decodeImage(m.payload).map(bmpFeatures(_, dim))
          case _ => None
        }
        DecodedFeatures(m.media_id, m.modality, m.format, m.payload.length.toLong,
          real.isDefined, real.getOrElse(decodeStub(m.payload, dim)))
      }
    }
  }
}
