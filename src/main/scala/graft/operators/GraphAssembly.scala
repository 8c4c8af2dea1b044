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

  /** K5 per-document chunker dispatch (`ecc/app/graphrag/workers.py:89-96`,
    * `ecc/app/ecc_util.py:15-42`): each document's `ctype` attribute selects
    * its chunker; a null/blank ctype falls back to `defaultCtype`. Takes a
    * frame with (doc_id, text[, ctype]) — a mixed corpus (html + markdown +
    * plain) chunks faithfully in ONE narrow pass; chunkers are constructed
    * once per (partition, ctype), not per row. Identical output to
    * [[chunks]] when every ctype is the default (ChunkersSpec asserts it).
    */
  def chunksByCtype(docs: DataFrame, defaultCtype: String = "regex",
      characterChunkSize: Int = 1024, characterOverlap: Int = 0): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withC =
      if (docs.columns.contains("ctype")) docs.select($"doc_id", $"text", $"ctype")
      else docs.select($"doc_id", $"text", lit(null).cast("string").as("ctype"))
    withC.as[(String, String, Option[String])]
      .mapPartitions { it =>
        val cache = scala.collection.mutable.HashMap.empty[String, graft.chunk.Chunker]
        it.flatMap { case (id, text, ct) =>
          val t = ct.map(_.toLowerCase.trim).filter(_.nonEmpty).getOrElse(defaultCtype)
          val chunker = cache.getOrElseUpdate(t,
            graft.chunk.Chunkers.forType(t, characterChunkSize, characterOverlap))
          val decoded = Normalize.unicodeUnescape(text)
          chunker.chunk(decoded).iterator.zipWithIndex.map { case (c, i) =>
            Chunk(id, i, s"${id}_chunk_$i", c)
          }
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
    *
    * Pure Catalyst (explode + codegen'd processIdCol) — the typed flatMap
    * form paid nested-Seq object deserialization per row, which dominated
    * the stage at bench scale.
    */
  private def entityOccurrences(extracted: Dataset[ExtractedGraphDoc]): DataFrame = {
    val spark = extracted.sparkSession
    import spark.implicits._
    // ONE scan: per row, build the occurrence array from nodes and rels in
    // array expressions, then a single explode. (A union of three exploded
    // branches re-read the extraction table three times — at bench scale the
    // extra scans dominated the stage.) The normalized rel endpoints are
    // materialized in their own projection first: higher-order lambdas get
    // no CSE, so inlining processIdCol would run the regexes per use-site.
    val prepped = extracted.toDF().select(
      filter(
        transform($"nodes", n => struct(
          Normalize.processIdCol(n.getField("id")).as("entity_id"),
          when(n.getField("description") === "", n.getField("id"))
            .otherwise(n.getField("description")).as("description"),
          Normalize.processIdCol(n.getField("node_type")).as("entity_type"))),
        o => o.getField("entity_id") =!= "").as("nocc"),
      transform($"rels", r => struct(
        Normalize.processIdCol(r.getField("source")).as("s"),
        Normalize.processIdCol(r.getField("target")).as("t"),
        r.getField("description").as("d"))).as("rr"))
    val occ = concat(
      $"nocc",
      transform(filter($"rr", r => r.getField("s") =!= ""),
        r => struct(r.getField("s").as("entity_id"), r.getField("d").as("description"),
          lit("").as("entity_type"))),
      transform(filter($"rr", r => r.getField("s") =!= "" && r.getField("t") =!= ""),
        r => struct(r.getField("t").as("entity_id"), r.getField("d").as("description"),
          lit("").as("entity_type"))))
    prepped.select(explode(occ).as("o"))
      .select($"o.entity_id", $"o.description", $"o.entity_type")
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
  def entities(extracted: Dataset[ExtractedGraphDoc]): Dataset[Entity] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    val occ = entityOccurrences(extracted)
    // dedup-first: (entity, description) distinct is a CODEGEN hash
    // aggregate whose partials bound any hot key per partition; only the
    // deduped pairs (tiny) reach the object-typed collect_list. Going
    // straight to collect_set would put the full occurrence stream through
    // ObjectHashAggregate, which falls back to SORT-based aggregation at
    // 128 distinct keys per task — at bench scale that sorted 58M rows.
    // (`Skew.saltedCollectSet` remains for set-aggregates whose DISTINCT
    // value count per key is itself web-hot.)
    // ONE scan, TWO hash aggregations, NO join: level 1 groups by
    // (entity, description) — the dedup — carrying min non-empty type per
    // pair (min-of-min == global min); level 2 folds to one row per entity.
    // The previous descs-side/types-side split re-read the occurrence
    // subtree twice (Catalyst has no cross-join common-subplan reuse) and
    // paid a 5th exchange for the join.
    occ.groupBy($"entity_id", $"description")
      .agg(min(when($"entity_type" =!= "", $"entity_type")).as("t"))
      .groupBy($"entity_id")
      .agg(sort_array(collect_list($"description")).as("descriptions"),
        min($"t").as("t"))
      .select($"entity_id", $"descriptions", coalesce($"t", lit("")).as("entity_type"))
      .as[Entity]
  }

  /** ENTITY_HAS_TYPE as a table (`SupportAI_Schema.gsql:38`): only extracted
    * nodes carry types (`workers.py:337-366` — the LLM-extractor branch).
    */
  def entityTypes(extracted: Dataset[ExtractedGraphDoc]): DataFrame = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.toDF().select(explode($"nodes").as("n"))
      .select(
        Normalize.processIdCol($"n.id").as("entity_id"),
        Normalize.processIdCol($"n.node_type").as("type_id"))
      .where($"entity_id" =!= "" && $"type_id" =!= "")
      .dropDuplicates("entity_id", "type_id")
  }

  /** CONTAINS_ENTITY provenance — extracted nodes only (`workers.py:311-324`). */
  def mentions(extracted: Dataset[ExtractedGraphDoc]): Dataset[Mention] = {
    val spark = extracted.sparkSession
    import spark.implicits._
    extracted.toDF().select($"chunk_id", explode($"nodes").as("n"))
      .select($"chunk_id", Normalize.processIdCol($"n.id").as("entity_id"))
      .where($"entity_id" =!= "")
      .dropDuplicates("chunk_id", "entity_id")
      .as[Mention]
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
    val df = extracted.toDF()
    // co-occurrence: ordered pairwise combinations i<j of the chunk's
    // processed node ids, generated inside one array expression (slice is
    // 1-based; index i is 0-based, so "after i" starts at i+2). `ids` is
    // materialized in its own projection FIRST — higher-order array
    // functions are interpreted without common-subexpression elimination,
    // so referencing the expression inline would re-run the regex
    // normalization once per lambda site per element.
    val withIds = df.select($"chunk_id",
      filter(
        transform($"nodes", n => Normalize.processIdCol(n.getField("id"))),
        x => x =!= "").as("ids"))
    val pairCol = flatten(transform($"ids", (x, i) =>
      transform(slice($"ids", i + lit(2), size($"ids")),
        y => struct(x.as("s"), y.as("o")))))
    val cooc = withIds.select($"chunk_id", explode(pairCol).as("p"))
      .select($"p.s".as("subj"), lit(CoOccurrencePred).as("pred"),
        $"p.o".as("obj"), $"chunk_id")
    val rels = df.select($"chunk_id", explode($"rels").as("r"))
      .select(
        Normalize.processIdCol($"r.source").as("subj"),
        $"r.relation_type".as("pred"),
        Normalize.processIdCol($"r.target").as("obj"),
        $"chunk_id")
      .where($"subj" =!= "" && $"obj" =!= "")
    cooc.unionByName(rels).as[Triple]
  }

  /** `relation_type` of the implicit same-chunk edges (`workers.py:341`). */
  val CoOccurrencePred = "DOC_CHUNK_COOCCURRENCE"
}
