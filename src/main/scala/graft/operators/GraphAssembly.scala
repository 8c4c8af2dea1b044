package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.chunk.Chunker
import graft.extract.Extractor
import graft.functions.Normalize
import graft.model._

/** Chunking + extraction + entity/mention/triple assembly — the Spark
  * realization of reference Phase A (`ecc/app/graphrag/graph_rag.py:494-525`),
  * SURVEY.md §2.3-§2.5. All stages are narrow (flatMap/mapPartitions) until
  * the entity set-merge, which is one partial+final hash aggregate.
  */
object GraphAssembly {

  /** pages → docs: doc_id = lower(url) (`SupportAI_InitialLoadJSON.gsql:3`). */
  def docs(pages: Dataset[Page]): Dataset[Doc] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map(p => Doc(Normalize.docId(p.url), p.text, p.lang, p.warc_ts))
  }

  /** docs → chunks. The text is unicode-unescape-decoded before chunking
    * exactly like the reference (`ecc/app/graphrag/workers.py:96`), chunk ids
    * are s"${doc_id}_chunk_$i" (`workers.py:104`). Narrow map — no shuffle.
    */
  def chunks(docs: Dataset[Doc], chunker: Chunker): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      val decoded = Normalize.unicodeUnescape(d.text)
      chunker.chunk(decoded).iterator.zipWithIndex.map { case (c, i) =>
        Chunk(d.doc_id, i, s"${d.doc_id}_chunk_$i", c)
      }
    }
  }

  /** chunks → per-chunk extraction results. mapPartitions so an expensive
    * extractor (a pooled model client in production) is constructed once per
    * partition — the Spark analogue of the reference's 20-way semaphore pool
    * (`workers.py:220-236`). Parse failures yield empty docs and are counted
    * downstream, never thrown.
    */
  def extractAll(chunks: Dataset[Chunk], extractor: Extractor): Dataset[ExtractedGraphDoc] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      val ex = extractor // per-partition instance (lazy internals init here)
      it.map(c => ex.extract(c.chunk_id, c.text))
    }
  }

  /** Per-occurrence entity rows, mirroring `workers.py:246-416` exactly:
    *   - extracted nodes: id = process_id(node.id), dropped if empty; stored
    *     description = node description, or the RAW node id if blank
    *     (`workers.py:255-258`); node type kept for ENTITY_HAS_TYPE;
    *   - relationship endpoints: source kept iff its id is nonempty; target
    *     kept iff BOTH ids are nonempty (the reference `continue`s out of the
    *     whole edge when the source id is empty, `workers.py:349-352,374-377`);
    *     stored description = the relationship definition (may be "").
    */
  private def entityOccurrences(extracted: Dataset[ExtractedGraphDoc])
      : Dataset[(String, String, String)] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.flatMap { doc =>
      val fromNodes = doc.nodes.iterator.flatMap { n =>
        val id = Normalize.processId(n.id)
        if (id.isEmpty) Iterator.empty
        else {
          val desc = if (n.description.isEmpty) n.id else n.description
          Iterator((id, desc, Normalize.processId(n.node_type)))
        }
      }
      val fromRels = doc.rels.iterator.flatMap { r =>
        val s = Normalize.processId(r.source)
        if (s.isEmpty) Iterator.empty
        else {
          val t = Normalize.processId(r.target)
          val src = Iterator((s, r.description, ""))
          if (t.isEmpty) src else src ++ Iterator((t, r.description, ""))
        }
      }
      (fromNodes ++ fromRels).toSeq
    }
  }

  /** Entities with set-merged descriptions — the order-independent grouped
    * aggregate that replaces the reference's read-modify-write description
    * merge (`workers.py:209-217`; set semantics make it associative,
    * SURVEY.md E5). entity_type = lexicographic min of observed types (an
    * entity CAN have several; the full mapping lives in [[entityTypes]]).
    *
    * Skew: collect_set partials for a web-hot entity ("united_states") stay
    * LARGE, so unlike plain counts the final reduce of one hot key is
    * unbounded — hence the two-phase salted merge (Skew.scala rationale):
    * phase 1 reduces (entity, salt-of-description) across many tasks, phase
    * 2 merges ≤ nSalts bounded partials. The exact-tuple dedups elsewhere
    * (triples, mentions) do NOT need this: their partial aggregation leaves
    * at most one row per partition per key, bounded by partition count.
    */
  def entities(extracted: Dataset[ExtractedGraphDoc], nSalts: Int = 64): Dataset[Entity] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    entityOccurrences(extracted)
      .toDF("entity_id", "description", "entity_type")
      .withColumn("__salt", Skew.saltCol($"description", nSalts))
      .groupBy($"entity_id", $"__salt")
      .agg(
        collect_set($"description").as("d_part"),
        min(when($"entity_type" =!= "", $"entity_type")).as("t_part"))
      .groupBy($"entity_id")
      .agg(
        sort_array(array_distinct(flatten(collect_list($"d_part")))).as("descriptions"),
        coalesce(min($"t_part"), lit("")).as("entity_type"))
      .as[Entity]
  }

  /** ENTITY_HAS_TYPE as a table (`SupportAI_Schema.gsql:38`): only extracted
    * nodes carry types (`workers.py:337-366` — the LLM-extractor branch).
    */
  def entityTypes(extracted: Dataset[ExtractedGraphDoc]): DataFrame = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted
      .flatMap { doc =>
        doc.nodes.flatMap { n =>
          val id = Normalize.processId(n.id)
          val tp = Normalize.processId(n.node_type)
          if (id.isEmpty || tp.isEmpty) None else Some((id, tp))
        }
      }
      .toDF("entity_id", "type_id")
      .dropDuplicates("entity_id", "type_id")
  }

  /** CONTAINS_ENTITY provenance — extracted nodes only (`workers.py:311-324`). */
  def mentions(extracted: Dataset[ExtractedGraphDoc]): Dataset[Mention] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.flatMap { doc =>
      doc.nodes.iterator
        .map(n => Normalize.processId(n.id))
        .filter(_.nonEmpty)
        .map(id => Mention(doc.chunk_id, id))
        .toSeq
    }.dropDuplicates("chunk_id", "entity_id").as[Mention]
  }

  /** The raw triple table: relationship edges + pairwise co-occurrence edges
    * for all node pairs i<j in one chunk (`workers.py:325-344`), with chunk
    * provenance. TigerGraph dedups RELATIONSHIP edges by
    * (src, tgt, relation_type) PK at upsert; we keep per-chunk provenance and
    * dedup at lift time instead.
    */
  def triples(extracted: Dataset[ExtractedGraphDoc]): Dataset[Triple] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.flatMap { doc =>
      val nodeIds = doc.nodes.map(n => Normalize.processId(n.id)).filter(_.nonEmpty)
      val cooc = for {
        i <- nodeIds.indices.iterator
        j <- (i + 1) until nodeIds.size
      } yield Triple(nodeIds(i), CoOccurrencePred, nodeIds(j), doc.chunk_id)
      val rels = doc.rels.iterator.flatMap { r =>
        val s = Normalize.processId(r.source)
        val t = Normalize.processId(r.target)
        if (s.isEmpty || t.isEmpty) Iterator.empty
        else Iterator(Triple(s, r.relation_type, t, doc.chunk_id))
      }
      (cooc ++ rels).toSeq
    }
  }

  /** `relation_type` of the implicit same-chunk edges (`workers.py:341`). */
  val CoOccurrencePred = "DOC_CHUNK_COOCCURRENCE"
}
