package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.chunk.Chunkers
import graft.corpus.CorpusSynth
import graft.extract.RuleExtractor
import graft.model.Triple

/** The streaming skin must emit exactly the same triples as the batch
  * stages on the same pages — and keep exactly-once across restarts.
  */
class StreamingKgSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming narrow stages == batch narrow stages on the same pages") {
    val cfg = CorpusSynth.Config(nPages = 40, nClusters = 8)
    val pages = CorpusSynth.pages(spark, cfg)

    val inDir = Files.createTempDirectory("graft-stream-in").toString
    val outDir = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    pages.write.mode("overwrite").parquet(inDir)

    val q = StreamingKg.run(spark, inDir, outDir, ckpt,
      Chunkers.forType("regex"), new RuleExtractor)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(s"$outDir/triples").as[Triple]
    val (_, batchTriples, _) = StreamingKg.narrowStages(
      pages, Chunkers.forType("regex"), new RuleExtractor)
    assert(streamed.count() == batchTriples.count())
    assert(streamed.toDF().exceptAll(batchTriples.toDF()).isEmpty)
    assert(batchTriples.toDF().exceptAll(streamed.toDF()).isEmpty)

    // restart with no new input: exactly-once, nothing re-emitted
    val q2 = StreamingKg.run(spark, inDir, outDir, ckpt,
      Chunkers.forType("regex"), new RuleExtractor)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$outDir/triples").count() == batchTriples.count())
  }

  test("eccLoop: streamed crawl batches merge into the standing KG == one batch run") {
    import graft.pipeline.{Catalog, Pipeline}
    val union = CorpusSynth.Config(seed = 42L, nPages = 200, nClusters = 24)
    val er = graft.resolve.Resolution.Params(dim = 512)

    // ground truth: one batch run over the union corpus
    val full = Pipeline.run(spark, Pipeline.Config(corpus = union, er = er,
      outDir = Files.createTempDirectory("graft-ecc-full").toString, runId = "full"))

    // standing catalog: full run over the first 120 pages, O(delta) layout
    val baseCfg = Pipeline.Config(corpus = union.copy(nPages = 120), er = er,
      outDir = Files.createTempDirectory("graft-ecc-base").toString,
      runId = "base", incrementalLayout = true, erBuckets = 16)
    Pipeline.run(spark, baseCfg)

    val inDir = Files.createTempDirectory("graft-ecc-in").toString
    val ckpt = Files.createTempDirectory("graft-ecc-ckpt").toString

    // crawl batch 1 arrives; the loop drains it into the catalog
    CorpusSynth.pagesRange(spark, union, 120, 160).write.mode("append").parquet(inDir)
    StreamingKg.eccLoop(spark, inDir, ckpt, baseCfg.copy(runId = "ecc"))
      .awaitTermination(300000)
    // crawl batch 2 arrives; same checkpoint — only the NEW file is processed
    CorpusSynth.pagesRange(spark, union, 160, 200).write.mode("append").parquet(inDir)
    StreamingKg.eccLoop(spark, inDir, ckpt, baseCfg.copy(runId = "ecc2"))
      .awaitTermination(300000)

    val cat = new Catalog(baseCfg.outDir, spark)
    def assertSame(table: String): Unit = {
      val a = full.catalog.read(table)
      val b = cat.read(table).select(a.columns.map(col(_)).toIndexedSeq: _*)
      assert(a.count() == b.count(), s"$table row count differs")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$table content differs")
    }
    Seq("chunks", "entities", "mentions", "triples", "resolves_to",
      "resolved_triples", "communities").foreach(assertSame)

    // at-least-once replay: a FRESH checkpoint re-delivers every input file;
    // the dirty gate makes the replay a no-op (idempotence is in the data
    // model, like the reference's 300s re-scan loop)
    val before = cat.read("resolved_triples").count()
    StreamingKg.eccLoop(spark, inDir,
      Files.createTempDirectory("graft-ecc-ckpt2").toString,
      baseCfg.copy(runId = "ecc3")).awaitTermination(300000)
    assertSame("resolved_triples")
    assert(cat.read("resolved_triples").count() == before)
  }
}
