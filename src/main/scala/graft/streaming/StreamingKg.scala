package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.chunk.Chunker
import graft.extract.Extractor
import graft.model._
import graft.operators.GraphAssembly

/** Structured Streaming skin over the KG-construction stages.
  *
  * The reference has no true streaming (its "stream_docs" is asyncio
  * micro-batching + a 300 s re-scan loop — SURVEY.md §1.4), so batch with
  * incremental lineage is the faithful core model. This skin exists because
  * the narrow stages (chunk → extract → triples/mentions) are
  * shape-identical in both engines: the SAME GraphAssembly transformations
  * applied to a streaming Dataset give a continuous ingest path whose
  * outputs the periodic batch jobs (ER, lifting, communities — inherently
  * global, so they stay batch) pick up from the append tables. That split —
  * streaming extraction feeding batch global stages — is exactly how a
  * production crawl pipeline runs.
  */
object StreamingKg {

  /** The narrow stage chain, engine-agnostic: works on a batch Dataset and
    * on a streaming Dataset unchanged (flatMap/mapPartitions only — no
    * aggregation state, so no watermark needed).
    */
  def narrowStages(pages: Dataset[Page], chunker: Chunker, extractor: Extractor)
      : (Dataset[Chunk], Dataset[Triple], Dataset[Mention]) = {
    val chunks = GraphAssembly.chunks(GraphAssembly.docs(pages), chunker)
    val extracted = GraphAssembly.extractAll(chunks, extractor)
    (chunks, GraphAssembly.triples(extracted), GraphAssembly.mentions(extracted))
  }

  /** Continuous ingest: watch `inDir` for new page parquet files, write
    * extracted triples to `outDir/triples` (append) with exactly-once file
    * sink semantics via `ckptDir`. `availableNow` drains the backlog and
    * stops — swap for a processing-time trigger in an always-on deployment.
    */
  def run(spark: SparkSession, inDir: String, outDir: String, ckptDir: String,
      chunker: Chunker, extractor: Extractor,
      availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val pageSchema = org.apache.spark.sql.Encoders.product[Page].schema
    val pages = spark.readStream.schema(pageSchema).parquet(inDir).as[Page]
    val (_, triples, _) = narrowStages(pages, chunker, extractor)
    val writer = triples.writeStream
      .format("parquet")
      .option("path", s"$outDir/triples")
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** The reference's actual operating mode as a stream: the eventual-
    * consistency loop (`ecc/app/eventual_consistency_checker.py:304-318` —
    * `while True: fetch_and_process_vertex()`, processing only dirty
    * documents, then `graph_rag.py:145-207` upserting the results into the
    * standing graph) realized as Structured Streaming over the page source
    * with [[graft.pipeline.Pipeline.runIncremental]] as the per-micro-batch
    * body: each arriving crawl batch is dirty-filtered against the standing
    * `pages` table, only the delta is chunked/extracted/embedded, and the
    * entity/triple/ER/community tables are MERGE-updated in place.
    *
    * Fault tolerance composes from two halves exactly like the reference's:
    * the file-source checkpoint makes batches at-least-once on restart, and
    * the dirty gate inside `runIncremental` (C6 absent-from-table check)
    * makes a replayed batch a no-op — idempotence lives in the data model,
    * not the delivery guarantee, which is what lets the reference re-scan
    * everything every 300 s without duplicating work. StreamingKgSpec
    * asserts both halves plus end-state equality with one batch run.
    *
    * `cfg.outDir` is the standing catalog of a prior full [[Pipeline.run]];
    * each micro-batch commits under runId `<cfg.runId>-b<batchId>` so
    * lineage rows attribute every table delta to its crawl batch.
    */
  def eccLoop(spark: SparkSession, inDir: String, ckptDir: String,
      cfg: graft.pipeline.Pipeline.Config,
      extractor: Extractor = new graft.extract.RuleExtractor,
      availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val pageSchema = org.apache.spark.sql.Encoders.product[Page].schema
    val pages = spark.readStream.schema(pageSchema).parquet(inDir).as[Page]
    val writer = pages.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.pipeline.Pipeline.runIncremental(spark,
            cfg.copy(runId = s"${cfg.runId}-b$batchId"), batch, extractor)
          ()
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
