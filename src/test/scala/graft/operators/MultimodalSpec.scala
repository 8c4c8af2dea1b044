package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synth is deterministic and schema-complete") {
    val a = Multimodal.synth(spark, 30).collect().sortBy(_.media_id)
    val b = Multimodal.synth(spark, 30).collect().sortBy(_.media_id)
    assert(a.map(_.media_id).toSeq == b.map(_.media_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.payload.sameElements(y.payload) })
    assert(a.map(_.modality).toSet == Set("image", "audio", "video"))
    assert(a.forall(_.payload.length >= 512))
  }

  test("extractFeatures: one fixed-dim vector per row, deterministic") {
    val media = Multimodal.synth(spark, 30)
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.features.length == 16))
    assert(f1.zip(f2).forall { case (x, y) => x.features.sameElements(y.features) })
    // features depend on content
    assert(f1.map(_.features.toSeq).distinct.length == 30)
  }

  test("sampleFrames: video rows only, ~duration/everyMs frames, ts monotonic") {
    val media = Multimodal.synth(spark, 30)
    val frames = Multimodal.sampleFrames(media, everyMs = 5000L).collect()
    assert(frames.nonEmpty)
    val vids = media.filter(_.modality == "video").collect().map(m => m.media_id -> m).toMap
    assert(frames.forall(f => vids.contains(f.media_id)))
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val expect = math.max(1L, vids(id).duration_ms / 5000L)
      assert(fs.length == expect, s"$id frames ${fs.length} != $expect")
      assert(fs.sortBy(_.frame_idx).map(_.frame_ts_ms).toSeq ==
        fs.map(_.frame_idx.toLong * 5000L).sorted.toSeq)
    }
  }

  test("metadata filter prunes before decode and pushes to the scan") {
    val media = Multimodal.synth(spark, 30)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(tmp)
    val onDisk = spark.read.parquet(tmp)
    val wide = onDisk.where($"modality" === "image" && $"width" >= 300)
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(width,300)") || plan.contains("width")),
      s"expected pushed filter on width in:\n$plan")
    val decoded = Multimodal.extractFeatures(onDisk.as[Multimodal.MediaRow]
      .filter(m => m.modality == "image" && m.width >= 300))
    val expected = media.collect().count(m => m.modality == "image" && m.width >= 300)
    assert(decoded.count() == expected)
  }

  test("repartitionBySize targets bytes, not rows") {
    val media = Multimodal.synth(spark, 60).toDF()
    val out = Multimodal.repartitionBySize(media, "payload", targetBytes = 32 * 1024)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 60)
  }
}
