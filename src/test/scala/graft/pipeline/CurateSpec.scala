package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.CorpusSynth

/** End-to-end curation funnel on the deterministic corpus with injected
  * web dirt: every dedup stage must collapse exactly its planted prey,
  * and the whole run must be reproducible and resumable.
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cfg(out: String) = Curate.Config(
    corpus = CorpusSynth.Config(nPages = 300, nClusters = 30),
    outDir = out, runId = "spec")

  test("funnel fingerprints: each stage collapses its planted dirt") {
    val out = Files.createTempDirectory("graft-curate-spec").toString
    val r = Curate.run(spark, cfg(out))
    val rows = r.stages.map(s => s.stage -> s.rows).toMap
    // 300 base + 15 recrawls + 17 mirrors + 6 caches = 338; URL dedup
    // collapses the recrawls, exact dedup the mirrors, near-dup the cache
    // pairs (the LONGER cache copy survives per the argmax-tokens rule);
    // decontam removes the eval slice + contaminated train docs
    assert(rows("cur_docs") == 338L)
    assert(rows("cur_url_dedup") == 323L)
    assert(rows("cur_exact_dedup") == 306L)
    assert(rows("cur_line_dedup") == 306L)
    assert(rows("cur_near_dedup") == 300L)
    assert(rows("cur_decontam") == 296L)
    assert(rows("cur_final") == rows("cur_mixture"))
    assert(rows("cur_packs") > 0L)

    // the cache copies won their clusters: every planted cache doc is
    // still present and its original is gone
    val kept = r.finalDocs.collect().map(_.getString(0)).toSet
    val nearDedup = r.catalog.read("cur_near_dedup")
      .collect().map(_.getString(0)).toSet
    val caches = nearDedup.filter(_.contains("cache."))
    assert(caches.nonEmpty)
    caches.foreach { c =>
      assert(!nearDedup.contains(c.replace("cache.", "")),
        s"original of $c should have lost the survivor pick")
    }
    assert(kept.subsetOf(nearDedup))
  }

  test("resume skips every completed stage with identical output") {
    val out = Files.createTempDirectory("graft-curate-resume").toString
    val first = Curate.run(spark, cfg(out))
    val firstDocs = first.finalDocs.collect().map(_.toString).sorted.toSeq
    val second = Curate.run(spark, cfg(out).copy(resume = true))
    assert(second.stages.forall(_.skipped),
      s"non-skipped: ${second.stages.filterNot(_.skipped).map(_.stage)}")
    assert(second.finalDocs.collect().map(_.toString).sorted.toSeq == firstDocs)
  }
}
