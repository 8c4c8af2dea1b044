package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, lit, sum}
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
    // loader shards cover the mixture exactly; manifests agree with a
    // direct recount of the assignment table
    assert(rows("cur_shards") == rows("cur_mixture"))
    val manifest = r.catalog.read("cur_shard_manifest")
      .select("shard_id", "n_docs", "total_tokens")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val recount = r.catalog.read("cur_shards")
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("t"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(manifest == recount, "manifest disagrees with the shard table")

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

  test("incremental ingest: history-blocked dedup gates, append-only survivors, replay no-op") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft-curate-incr").toString
    val base = cfg(out)
    Curate.run(spark, base)
    val cat = new Catalog(out, spark)
    val baseKept = cat.read("cur_near_dedup").count()
    val baseDocs = cat.read("cur_docs").count()

    // a surviving history doc to clone dirt from (post-funnel text so the
    // exact-dedup digest and near-dup shingles genuinely match history)
    val donor = cat.read("cur_near_dedup").orderBy(col("doc_id")).limit(1)
      .collect()(0)
    val donorId = donor.getString(0); val donorText = donor.getString(2)
    // the URL gate matches on canonicalized ORIGINAL urls (case preserved)
    val donorUrl = cat.read("cur_docs").where(col("doc_id") === donorId)
      .select(col("url")).collect()(0).getString(0)
    // the exact gate hashes PRE-line-dedup history texts (cur_exact_dedup)
    val donorExactText = cat.read("cur_exact_dedup")
      .where(col("doc_id") === donorId).select(col("text"))
      .collect()(0).getString(0)

    // batch: 40 genuinely new pages + four planted history collisions
    val union = base.corpus.copy(nPages = 340)
    val freshPages = CorpusSynth.pagesRange(spark, union, 300, 340)
      .select(col("url"), col("lang"), col("text"))
    import spark.implicits._
    val dirt = Seq(
      (donorId, "en", donorText), // re-crawl of an ingested id -> dirty gate
      (donorUrl + "?utm_source=feed", "en", donorText), // url variant -> url gate
      ("https://mirror2.example.org/copy", "en", donorExactText), // exact -> Bloom gate
      ("https://near2.example.org/copy", "en",
        donorText + " archived snapshot trailing words")) // near-dup -> LSH gate
      .toDF("url", "lang", "text")
    val batch = freshPages.unionByName(dirt)

    val incr = Curate.runIncremental(spark, base.copy(runId = "incr1"), batch)
    val rows = incr.stages.map(s => s.stage -> s.rows).toMap
    assert(rows("incr_cur_docs") == 43L, s"dirty gate: $rows") // 44 - recrawl
    assert(rows("incr_cur_url_dedup") == 42L) // - utm variant
    assert(rows("incr_cur_exact_dedup") == 41L) // - exact mirror (Bloom)
    assert(rows("incr_cur_near_dedup") == 40L) // - near-dup (history LSH probe)

    // history never retracted, survivors appended exactly once
    val keptNow = cat.read("cur_near_dedup")
    assert(keptNow.count() == baseKept + 40L)
    assert(keptNow.where(col("doc_id") === donorId).count() == 1L)
    assert(keptNow.where(col("doc_id").contains("near2")).count() == 0L)
    // the blocking index grew by the survivors' band rows only
    assert(cat.read("cur_lsh_sigs").select("id").distinct().count() == baseKept + 40L)
    // decontam appended bench + train splits that cover the 40 survivors
    assert(rows("incr_cur_decontam") <= 40L)
    // derived tail regenerated over the union corpus
    assert(cat.read("cur_final").count() == cat.read("cur_mixture").count())

    // replaying the same batch is a no-op at the dirty gate
    val again = Curate.runIncremental(spark, base.copy(runId = "incr2"), batch)
    assert(again.stages.find(_.stage == "incr_cur_docs").get.rows == 0L)
    assert(cat.read("cur_near_dedup").count() == baseKept + 40L)
    assert(cat.read("cur_docs").count() == baseDocs + 43L)
  }
}
