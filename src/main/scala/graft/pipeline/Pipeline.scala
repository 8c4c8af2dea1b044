package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.chunk.{Chunkers, Chunker}
import graft.corpus.CorpusSynth
import graft.extract.{Extractor, RuleExtractor}
import graft.model._
import graft.operators.{GraphAssembly, Lift}
import graft.resolve.Resolution

/** The KG-construction pipeline driver — reference `graphrag.run()`
  * (`ecc/app/graphrag/graph_rag.py:478-609`) re-expressed as sequenced Spark
  * jobs over checkpointed tables:
  *
  *   pages → docs → chunks → extracted → {entities, entity_types, mentions,
  *   triples} → embeddings → candidate pairs → resolves_to →
  *   resolved_triples → type_relationships
  *
  * The reference's asyncio channels collapse into partition parallelism; its
  * polling barriers (`vertices_have_embedding`, `entities_have_resolution`)
  * collapse into job ordering. Every stage writes its table + a lineage row;
  * `resume = true` skips stages whose table committed under the same input
  * fingerprint — the Spark analogue of the ECC's epoch-lifecycle re-scan
  * (SURVEY.md §1.4, §2.2).
  */
object Pipeline {

  final case class Config(
      corpus: CorpusSynth.Config = CorpusSynth.Config(),
      chunkerType: String = "regex", // reference default pattern \r?\n (ecc_util.py:25-28)
      characterChunkSize: Int = 1024,
      characterOverlap: Int = 0,
      er: Resolution.Params = Resolution.Params(),
      outDir: String = "/tmp/graft-pipeline",
      runId: String = "run-0",
      resume: Boolean = false,
      /** write partitions for the big tables; tune to cluster size. */
      shufflePartitions: Option[Int] = None) {
    def fingerprintBase: String =
      s"$corpus|$chunkerType|$characterChunkSize|$characterOverlap|$er"
  }

  final case class Result(catalog: Catalog, stages: Seq[StageResult]) {
    def resolvedTriples: Dataset[ResolvedTriple] = {
      val spark = catalog.spark
      import spark.implicits._
      catalog.read("resolved_triples").as[ResolvedTriple]
    }
  }

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .take(12).map("%02x".format(_)).mkString

  def chunkerFor(cfg: Config): Chunker =
    Chunkers.forType(cfg.chunkerType, cfg.characterChunkSize, cfg.characterOverlap)

  def run(spark: SparkSession, cfg: Config, extractor: Extractor = new RuleExtractor): Result = {
    import spark.implicits._
    val cat = new Catalog(cfg.outDir, spark)
    val results = Vector.newBuilder[StageResult]
    var upstream = sha(cfg.fingerprintBase)

    def stage(name: String)(build: Catalog => Long): Unit = {
      upstream = sha(s"$upstream/$name")
      results += Catalog.stage(cat, cfg.runId, name, upstream, cfg.resume)(build(cat))
    }

    stage("pages") { c =>
      val pages = CorpusSynth.pages(spark, cfg.corpus)
      c.writeCounted("pages", pages.toDF(), cfg.shufflePartitions)
    }

    stage("chunks") { c =>
      val pages = c.read("pages").as[Page]
      val chunks = GraphAssembly.chunks(GraphAssembly.docs(pages), chunkerFor(cfg))
      c.writeCounted("chunks", chunks.toDF())
    }

    stage("extracted") { c =>
      val chunks = c.read("chunks").as[Chunk]
      val extracted = GraphAssembly.extractAll(chunks, extractor)
      // lineage counts DROPS, not just rows: parse failures are empty docs —
      // observed during the write, no second scan
      c.writeCounted("extracted", extracted.toDF(), None,
        org.apache.spark.sql.functions.expr(
          "count(CASE WHEN size(nodes) > 0 or size(rels) > 0 THEN 1 END)"))
    }

    stage("entities") { c =>
      val extracted = c.read("extracted").as[ExtractedGraphDoc]
      c.writeCounted("entities", GraphAssembly.entities(extracted).toDF())
    }

    stage("entity_types") { c =>
      val extracted = c.read("extracted").as[ExtractedGraphDoc]
      c.writeCounted("entity_types", GraphAssembly.entityTypes(extracted))
    }

    stage("mentions") { c =>
      val extracted = c.read("extracted").as[ExtractedGraphDoc]
      c.writeCounted("mentions", GraphAssembly.mentions(extracted).toDF())
    }

    stage("triples") { c =>
      val extracted = c.read("extracted").as[ExtractedGraphDoc]
      c.writeCounted("triples", GraphAssembly.triples(extracted).toDF(), cfg.shufflePartitions)
    }

    stage("embeddings") { c =>
      val entities = c.read("entities").as[Entity]
      c.writeCounted("embeddings", Resolution.embedEntities(entities, cfg.er))
    }

    // every DocumentChunk is embedded (`ecc/app/graphrag/workers.py:115-117`,
    // embed worker :175-206) — these vectors feed Q2/Q3/Q5 vector retrieval
    stage("chunk_embeddings") { c =>
      val chunks = c.read("chunks")
      c.writeCounted("chunk_embeddings",
        graft.extract.Embeddings.embedText(chunks, "chunk_id", "text", cfg.er.dim),
        cfg.shufflePartitions)
    }

    stage("candidate_pairs") { c =>
      val emb = c.read("embeddings")
      c.writeCounted("candidate_pairs", Resolution.candidatePairs(emb, cfg.er))
    }

    stage("resolves_to") { c =>
      val entities = c.read("entities").as[Entity]
      val pairs = c.read("candidate_pairs")
      c.writeCounted("resolves_to", Resolution.resolvesTo(entities, pairs).toDF())
    }

    stage("resolved_triples") { c =>
      val triples = c.read("triples").as[Triple]
      val res = c.read("resolves_to").as[ResolvesTo]
      c.writeCounted("resolved_triples", Lift.resolvedTriples(triples, res).toDF(),
        cfg.shufflePartitions)
    }

    stage("type_relationships") { c =>
      val triples = c.read("triples").as[Triple]
      val types = c.read("entity_types")
      c.writeCounted("type_relationships", Lift.typeRelationships(triples, types).toDF())
    }

    stage("communities") { c =>
      import org.apache.spark.sql.functions.{col, lit}
      val rt = c.read("resolved_triples")
      val res = c.read("resolves_to")
      val louv = graft.community.Louvain.run(rt,
        allEntities = Some(res.select(col("canonical_id")).distinct()))
      val descs = graft.community.Summarize.describeAll(
        louv.levels, c.read("entities"), res.as[ResolvesTo].toDF())
      val comms = louv.levels.map(_.communities).reduce(_ unionByName _)
        .join(descs, Seq("community_id", "iteration"), "left")
      val nComms = c.writeCounted("communities", comms)
      c.write("in_community", louv.levels.head.membership
        .toDF("canonical_id", "community_id"))
      if (louv.levels.size > 1)
        c.write("has_parent", louv.levels.tail.map(_.membership).reduce(_ unionByName _)
          .toDF("community_id", "parent_id"))
      else
        c.write("has_parent", spark.emptyDataFrame
          .withColumn("community_id", lit("")).withColumn("parent_id", lit("")).limit(0))
      c.write("links_to", louv.levels.map(_.linksTo).reduce(_ unionByName _))
      c.write("modularity",
        louv.modularities.zipWithIndex
          .map { case (q, i) => (i + 1, q) }.toDF("iteration", "modularity"))
      nComms
    }

    // community summaries are embedded like the reference's embed pass over
    // community descriptions (`workers.py:530-560`) — Q4 vector seeding
    stage("community_embeddings") { c =>
      val comms = c.read("communities")
        .na.fill("", Seq("description"))
      c.writeCounted("community_embeddings",
        graft.extract.Embeddings.embedText(comms, "community_id", "description", cfg.er.dim))
    }

    Result(cat, results.result())
  }
}
