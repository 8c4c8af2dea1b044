package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Query-side retrieval operators over the materialized KG tables — the
  * Spark realization of the reference's retriever GSQL (SURVEY.md §2.9,
  * the .gsql files under `common/gsql/supportai/retrievers/`). All are
  * plain Dataset pipelines; the LLM-coupled driver steps (HyDE, answer
  * generation, `graphrag/app/supportai/retrievers/` python) sit above this
  * layer.
  */
object Retrieval {

  /** Q1 `Keyword_Search` (`Keyword_Search.gsql:28-48`): per keyword, chunks
    * whose text matches `%kw%` (lowercased, spaces → `%`); `ANY` mode unions
    * matches, `ALL` intersects; each chunk counts how many keywords hit it;
    * top-k by hit count (deterministic tiebreak by chunk_id).
    */
  def keywordSearch(chunks: DataFrame, keywords: Seq[String],
      mode: String = "ANY", topK: Int = 5): DataFrame = {
    require(keywords.nonEmpty, "keywords must be non-empty")
    val patterns = keywords.map(k => "%" + k.toLowerCase.replace(" ", "%") + "%")
    val hitCols = patterns.map(p => when(lower(col("text")).like(p), 1L).otherwise(0L))
    val hits = hitCols.reduce(_ + _)
    val matchedAll = hitCols.map(_ > 0).reduce(_ && _)
    val matchedAny = hitCols.map(_ > 0).reduce(_ || _)
    val selected = if (mode.equalsIgnoreCase("ALL")) matchedAll else matchedAny
    chunks.select(col("chunk_id"), col("text"), hits.as("num_times_seen"))
      .where(selected)
      .orderBy(col("num_times_seen").desc, col("chunk_id"))
      .limit(topK)
  }

  /** Q2 `Content_Similarity_Vector_Search`
    * (`Content_Similarity_Vector_Search.gsql:17-54`): top-k cosine over a
    * vertex type's embeddings, then fetch the content. `withEmbeddings` is
    * (id, embedding, content).
    */
  def contentSimilaritySearch(withEmbeddings: DataFrame, queryVec: Array[Float],
      topK: Int): DataFrame = {
    val q = lit(queryVec)
    withEmbeddings
      .withColumn("similarity", Similarity.cosineFast(col("embedding"), q))
      .orderBy(col("similarity").desc, col("id"))
      .limit(topK)
      .select(col("id"), round(col("similarity"), 6).as("similarity"), col("content"))
  }

  /** Q3 `Chunk_Sibling_Search` (`Chunk_Sibling_Search.gsql:46-73`): for each
    * seed chunk, its IS_AFTER chain neighbors within [-lookback, +lookahead]
    * with signed distance (negative = earlier). IS_AFTER is derivable from
    * (doc_id, idx), so the traversal is one self-join per direction distance
    * — realized as a single range join on idx.
    */
  def siblingSearch(chunks: DataFrame, seedChunkIds: Seq[String],
      lookback: Int = 3, lookahead: Int = 3): DataFrame = {
    val seeds = chunks
      .where(col("chunk_id").isin(seedChunkIds: _*))
      .select(col("chunk_id").as("seed_chunk_id"), col("doc_id").as("seed_doc"),
        col("idx").as("seed_idx"))
    chunks.join(seeds,
        col("doc_id") === col("seed_doc") &&
          col("idx").between(col("seed_idx") - lookback, col("seed_idx") + lookahead))
      .select(col("seed_chunk_id"), col("chunk_id"),
        (col("idx") - col("seed_idx")).cast("long").as("distance"), col("text"))
  }

  /** Q4 `GraphRAG_Community_Search` (`GraphRAG_Community_Search.gsql:17-67`):
    * seed communities at level L, descend HAS_PARENT to level 1, then gather
    * member entities (via IN_COMMUNITY ← RESOLVES_TO) and their chunk text
    * (via CONTAINS_ENTITY provenance), plus the seed's own description.
    *
    * @return (seed_community_id, chunk_id, text) context rows + description
    */
  def communitySearch(
      communities: DataFrame, hasParent: DataFrame, inCommunity: DataFrame,
      resolvesTo: DataFrame, mentions: DataFrame, chunks: DataFrame,
      seedCommunityIds: Seq[String]): DataFrame = {
    val spark = communities.sparkSession
    import spark.implicits._

    val seeds = communities
      .where($"community_id".isin(seedCommunityIds: _*))
      .select($"community_id".as("seed_community_id"), $"iteration", $"description")

    // descend to level 1: repeatedly follow has_parent(child <- parent)
    val maxIter = seeds.agg(coalesce(max($"iteration"), lit(1))).as[Int].collect()(0)
    var frontier = seeds.select($"seed_community_id", $"seed_community_id".as("community_id"),
      $"iteration")
    var level = maxIter
    while (level > 1) {
      val down = hasParent.select($"community_id".as("child_id"), $"parent_id")
      frontier = frontier.as("f")
        .join(down, $"f.community_id" === $"parent_id", "left")
        .select($"seed_community_id",
          coalesce($"child_id", $"f.community_id").as("community_id"),
          when($"child_id".isNotNull, $"f.iteration" - 1).otherwise($"f.iteration").as("iteration"))
      level -= 1
    }

    val members = frontier
      .join(inCommunity, "community_id")
      .join(resolvesTo.select($"canonical_id", $"entity_id"), "canonical_id")
    val context = members
      .join(mentions, "entity_id")
      .join(chunks.select($"chunk_id", $"text"), "chunk_id")
      .select($"seed_community_id", $"chunk_id", $"text")
      .distinct()
    context.join(
      seeds.select($"seed_community_id", $"description"), "seed_community_id")
  }

  /** Q5 `GraphRAG_Hybrid_Search` BFS core
    * (`GraphRAG_Hybrid_Search.gsql:48-115`): k-hop expansion (numHops ≤ 5)
    * from seed entities over the relationship edges, counting how many times
    * each vertex is reached (`num_times_seen`); vertices seen ≥ numSeenMin
    * survive. Edges are traversed undirected, matching the reference's
    * edge-type set with reverse edges.
    *
    * @param edges (subj, obj) relationship pairs (pred-agnostic)
    * @return (entity_id, num_times_seen, first_hop)
    */
  def hybridExpand(edges: DataFrame, seedEntityIds: Seq[String],
      numHops: Int = 2, numSeenMin: Long = 1): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(numHops <= 5, "reference caps num_hops at 5")

    val und = edges.select($"subj".as("src"), $"obj".as("dst"))
      .union(edges.select($"obj".as("src"), $"subj".as("dst")))
      .distinct().localCheckpoint(true)

    var seen = seedEntityIds.map(id => (id, 1L, 0))
      .toDF("entity_id", "num_times_seen", "first_hop")
    var frontier = seedEntityIds.toDF("entity_id")
    for (hop <- 1 to numHops) {
      val next = und.join(frontier.select($"entity_id".as("src")), "src")
        .groupBy($"dst".as("entity_id"))
        .agg(count(lit(1)).as("reached"))
      seen = seen.as("s")
        .join(next.as("n"), Seq("entity_id"), "full_outer")
        .select(
          $"entity_id",
          (coalesce($"s.num_times_seen", lit(0L)) + coalesce($"n.reached", lit(0L)))
            .as("num_times_seen"),
          coalesce($"s.first_hop", lit(hop)).as("first_hop"))
        .localCheckpoint(true)
      frontier = next.select($"entity_id")
    }
    seen.where($"num_times_seen" >= numSeenMin)
  }

  /** Q6 `Entity_Relationship_Retrieval`
    * (`Entity_Relationship_Retrieval.gsql:17-52`), full semantics:
    *   - seed vertices = entities whose lowercased id LIKE any entity
    *     pattern, UNION Relationship vertices (one per relation type,
    *     short_name = the type — `eventual_consistency_checker.py:171`)
    *     whose lowercased short_name LIKE any relationship pattern;
    *   - chunks directly adjacent to a seed (CONTAINS_ENTITY /
    *     MENTIONS_RELATIONSHIP provenance) score +2 — once per chunk, not
    *     per seed (the GSQL POST-ACCUM runs once per matched vertex);
    *   - chunks of DOCUMENTS adjacent to a seed (doc-level CONTAINS_ENTITY,
    *     realized as "the document has a chunk mentioning the seed") score
    *     +1 — so a chunk can score 1, 2 or 3;
    *   - top-k by score, deterministic tie-break by chunk_id, with text.
    */
  def entityRelationshipRetrieval(entities: DataFrame, mentions: DataFrame,
      chunks: DataFrame, triples: DataFrame,
      entityLikes: Seq[String], relationshipLikes: Seq[String] = Nil,
      topK: Int = 5): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    require(entityLikes.nonEmpty || relationshipLikes.nonEmpty, "need at least one pattern")

    def likeAny(c: Column, pats: Seq[String]): Column =
      pats.map(p => lower(c).like(p.toLowerCase)).reduceOption(_ || _).getOrElse(lit(false))

    val seedEnts = entities.where(likeAny($"entity_id", entityLikes)).select($"entity_id")
    val seedRels = triples.select($"pred").distinct()
      .where(likeAny($"pred", relationshipLikes)).select($"pred")

    // chunks directly adjacent to any seed vertex (distinct — +2 once)
    val directChunks = mentions.join(seedEnts, "entity_id").select($"chunk_id")
      .unionByName(triples.join(seedRels, "pred").select($"chunk_id"))
      .distinct()

    // documents adjacent to any seed (doc-level containment), then ALL their
    // chunks (+1 once per chunk)
    val chunkDoc = chunks.select($"chunk_id", $"doc_id")
    val seedDocs = directChunks.join(chunkDoc, "chunk_id").select($"doc_id").distinct()
    val docChunks = chunkDoc.join(seedDocs, "doc_id").select($"chunk_id").distinct()

    directChunks.withColumn("direct", lit(2L))
      .join(docChunks.withColumn("via_doc", lit(1L)), Seq("chunk_id"), "full_outer")
      .select($"chunk_id",
        (coalesce($"direct", lit(0L)) + coalesce($"via_doc", lit(0L))).as("touch_count"))
      .join(chunks.select($"chunk_id", $"text"), "chunk_id")
      .orderBy($"touch_count".desc, $"chunk_id")
      .limit(topK)
  }

  /** Q2 non-vector variant `Content_Similarity_Search`
    * (`Content_Similarity_Search.gsql:29-47`): the retriever's id-seeded
    * form — a JSON list of (vertex id, type) seeds, no vector at all; each
    * seed fetches its content by type: DocumentChunk/Document → the
    * Content vertex's text (our chunk/doc text lives on the same row),
    * Entity/Concept → the definition (our sorted description set, "; "
    * joined), Community → its description. Unknown ids fetch nothing (the
    * GSQL traversal simply finds no edge).
    *
    * @param seeds (id, vtype) with vtype ∈ {DocumentChunk, Document,
    *              Entity, Concept, Community}
    * @return (id, vtype, content)
    */
  def contentFetch(seeds: Seq[(String, String)], chunks: DataFrame,
      docs: DataFrame, entities: DataFrame, communities: DataFrame): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    require(seeds.nonEmpty, "need at least one (id, type) seed")
    val seedDf = seeds.toDF("id", "vtype")
    def ofType(t: String) = seedDf.where($"vtype" === t)
    val chunkRows = ofType("DocumentChunk")
      .join(chunks.select($"chunk_id".as("id"), $"text".as("content")), "id")
    val docRows = ofType("Document")
      .join(docs.select($"doc_id".as("id"), $"text".as("content")), "id")
    val entityContent = entities.select($"entity_id".as("id"),
      concat_ws("; ", $"descriptions").as("content"))
    val entityRows = ofType("Entity").join(entityContent, "id")
    val conceptRows = ofType("Concept").join(entityContent, "id")
    val communityRows = ofType("Community")
      .join(communities.select($"community_id".as("id"), $"description".as("content")), "id")
    chunkRows.unionByName(docRows).unionByName(entityRows)
      .unionByName(conceptRows).unionByName(communityRows)
      .select($"id", $"vtype", $"content")
  }

  // ------------------------------------------------- typed hybrid search

  /** Typed-vertex prefixes: one string namespace for the hybrid BFS without
    * entity/chunk id collisions.
    */
  val EntityPrefix = "E:"
  val RelationshipPrefix = "R:"
  val ChunkPrefix = "C:"

  /** The typed edge set GraphRAG_Hybrid_Search traverses
    * (`GraphRAG_Hybrid_Search.gsql:52-57`): RELATIONSHIP> (one edge per
    * distinct (subj, relation_type, obj) — parallel predicates count as
    * separate arrivals), CONTAINS_ENTITY> + its reverse (the ONLY
    * bidirectional type in the list), IS_AFTER> (chunk_i → chunk_{i−1},
    * `workers.py:164-169`), IS_HEAD_OF> (entity → relationship-type vertex)
    * and HAS_TAIL> (relationship-type vertex → entity) — Relationship
    * vertices are per relation TYPE (`supportai/workers.py:230-245`).
    */
  def typedEdges(triples: DataFrame, mentions: DataFrame, chunks: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val rel = triples.select($"subj", $"pred", $"obj").distinct()
    val relationship = rel.select(
      concat(lit(EntityPrefix), $"subj").as("src"),
      concat(lit(EntityPrefix), $"obj").as("dst"),
      lit("RELATIONSHIP").as("etype"))
    val isHeadOf = rel.select($"subj", $"pred").distinct().select(
      concat(lit(EntityPrefix), $"subj").as("src"),
      concat(lit(RelationshipPrefix), $"pred").as("dst"),
      lit("IS_HEAD_OF").as("etype"))
    val hasTail = rel.select($"pred", $"obj").distinct().select(
      concat(lit(RelationshipPrefix), $"pred").as("src"),
      concat(lit(EntityPrefix), $"obj").as("dst"),
      lit("HAS_TAIL").as("etype"))
    val containsEntity = mentions.select(
      concat(lit(ChunkPrefix), $"chunk_id").as("src"),
      concat(lit(EntityPrefix), $"entity_id").as("dst"),
      lit("CONTAINS_ENTITY").as("etype"))
    val containsEntityRev = mentions.select(
      concat(lit(EntityPrefix), $"entity_id").as("src"),
      concat(lit(ChunkPrefix), $"chunk_id").as("dst"),
      lit("reverse_CONTAINS_ENTITY").as("etype"))
    // IS_AFTER by (doc_id, idx−1) self-join — id-scheme agnostic
    val pos = chunks.select($"doc_id", $"idx", $"chunk_id")
    val isAfter = pos.as("c")
      .join(pos.select($"doc_id", ($"idx" + 1).as("idx"), $"chunk_id".as("prev_id")).as("p"),
        Seq("doc_id", "idx"))
      .select(
        concat(lit(ChunkPrefix), $"chunk_id").as("src"),
        concat(lit(ChunkPrefix), $"prev_id").as("dst"),
        lit("IS_AFTER").as("etype"))
    relationship.unionByName(isHeadOf).unionByName(hasTail)
      .unionByName(containsEntity).unionByName(containsEntityRev)
      .unionByName(isAfter)
  }

  /** Q5 `GraphRAG_Hybrid_Search` BFS (`GraphRAG_Hybrid_Search.gsql:49-66`)
    * with the reference's exact guards:
    *   - seeds start with @parents = {self} and @num_times_seen = numSeenMin
    *     (so they always survive the final filter);
    *   - per hop, only vertices with @visited < 1 expand, and an edge is
    *     taken only when the target is NOT in the source's ancestor set
    *     (@parents) — the cycle guard;
    *   - each traversed edge increments the target's @num_times_seen and
    *     merges the source's ancestors into the target's;
    *   - the result is per-seed: every reached vertex with num_times_seen ≥
    *     numSeenMin is attributed to each SEED in its ancestor set
    *     (`:60-66` FOREACH v IN s.@parents IF v IN start_set).
    *
    * @param edges typed edges from [[typedEdges]] (prefixed vertex ids)
    * @return (seed_id, vertex_id, vtype, num_times_seen)
    */
  def hybridExpandTyped(edges: DataFrame, seedVertexIds: Seq[String],
      numHops: Int = 2, numSeenMin: Long = 1): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(numHops <= 5, "reference caps num_hops at 5")

    val e = edges.select($"src", $"dst").localCheckpoint(true)
    val seeds = seedVertexIds.distinct
    // ancestor state is split by what actually reads it:
    //   guardAnc (v, parent) — the cycle guard's full ancestor set, kept ONLY
    //     for vertices that can still expand (@visited < 1 means a vertex
    //     expands at most once, so a visited vertex's guard set is dead) —
    //     pruning it per hop removes the dense-graph product term r2 carried
    //     for every interior vertex;
    //   seedAnc (v, seed) — ancestors ∩ seeds, for the final per-seed
    //     attribution (`:60-66` FOREACH v IN s.@parents IF v IN start_set
    //     only ever consults seeds) — grows for visited vertices too, but is
    //     bounded by |reached| × |seeds| instead of |reached|².
    var guardAnc = seeds.map(s => (s, s)).toDF("v", "parent").localCheckpoint(true)
    var seedAnc = seeds.map(s => (s, s)).toDF("v", "seed").localCheckpoint(true)
    var seen = seeds.map(s => (s, numSeenMin)).toDF("v", "cnt")
    var visited = spark.emptyDataset[String].toDF("v")
    var frontier = seeds.toDF("v")
    var reached = seeds.toDF("v")
    var hop = 0
    var done = false

    while (hop < numHops && !done) {
      hop += 1
      val active = frontier.join(visited, Seq("v"), "left_anti")
        .withColumnRenamed("v", "src")
      val arr = e.join(active, "src")
      // cycle guard: target not among the source's ancestors
      val arrOk = arr.join(
          guardAnc.select($"v".as("src"), $"parent".as("dst")), Seq("src", "dst"), "left_anti")
        .localCheckpoint(true)
      if (arrOk.isEmpty) done = true
      else {
        visited = visited.unionByName(arrOk.select($"src".as("v")).distinct())
          .distinct().localCheckpoint(true)
        seen = seen.unionByName(arrOk.groupBy($"dst".as("v")).agg(count(lit(1)).as("cnt")))
          .groupBy($"v").agg(sum($"cnt").as("cnt"))
        val guardNew = arrOk.select($"dst".as("v"), $"src".as("parent"))
          .unionByName(arrOk.join(guardAnc.withColumnRenamed("v", "src"), "src")
            .select($"dst".as("v"), $"parent"))
        guardAnc = guardAnc.unionByName(guardNew).distinct()
          .join(visited, Seq("v"), "left_anti") // visited vertices never expand again
          .localCheckpoint(true)
        val seedNew = arrOk.join(seedAnc.withColumnRenamed("v", "src"), "src")
          .select($"dst".as("v"), $"seed")
        seedAnc = seedAnc.unionByName(seedNew).distinct().localCheckpoint(true)
        frontier = arrOk.select($"dst".as("v")).distinct().localCheckpoint(true)
        reached = reached.unionByName(frontier).distinct()
      }
    }

    val surviving = reached.join(seen, "v").where($"cnt" >= numSeenMin)
    surviving
      .join(seedAnc, "v")
      .select($"seed".as("seed_id"), $"v".as("vertex_id"),
        substring_index($"v", ":", 1).as("vtype"), $"cnt".as("num_times_seen"))
      .distinct()
  }

  /** Context assembly over a [[hybridExpandTyped]] result — the GSQL's
    * final per-type ACCUM (`GraphRAG_Hybrid_Search.gsql:68-81` + the
    * HAS_CONTENT hop `:95-101`):
    *   - Entity rows render "Entity: <id with underscores as spaces>,
    *     Description: <desc>; <desc>; ..." (`:72-77`, descriptions joined
    *     in deterministic sorted order — ours are pre-sorted);
    *   - Relationship rows carry the relation type (the vertex's
    *     short_name; our triples do not retain per-edge definitions);
    *   - DocumentChunk rows fetch the chunk text;
    *   - Document rows are excluded (`:69` s.type != "Document").
    *
    * @return (seed_id, vertex_id, vtype, num_times_seen, context)
    */
  def hybridContext(expanded: DataFrame, entities: DataFrame, chunks: DataFrame): DataFrame = {
    val spark = expanded.sparkSession
    import spark.implicits._
    val bare = substring(col("vertex_id"), 3, Int.MaxValue)
    val entCtx = expanded.where($"vtype" === "E")
      .join(entities.select($"entity_id",
          concat_ws("; ", $"descriptions").as("desc_all")),
        bare === col("entity_id"), "left")
      .withColumn("context",
        concat(lit("Entity: "), regexp_replace(bare, "_", " "),
          lit(", Description: "), coalesce($"desc_all", lit(""))))
      .drop("entity_id", "desc_all")
    val relCtx = expanded.where($"vtype" === "R")
      .withColumn("context", bare)
    val chunkCtx = expanded.where($"vtype" === "C")
      .join(chunks.select($"chunk_id", $"text"), bare === col("chunk_id"), "left")
      .withColumn("context", coalesce($"text", lit("")))
      .drop("chunk_id", "text")
    entCtx.unionByName(relCtx).unionByName(chunkCtx)
  }

  // ---------------------------------------------- vector-seeded retrievers

  /** Top-k ids by cosine against one query vector — the `vectorSearch(...)`
    * seeding step every `*_Vector_Search` retriever starts with
    * (`GraphRAG_Community_Vector_Search.gsql:24-25`). Embeddings table is
    * (id, embedding); returns (id, similarity) ordered.
    */
  def vectorSeeds(embeddings: DataFrame, queryVec: Array[Float], topK: Int,
      idCol: String = "id"): DataFrame = {
    val q = lit(queryVec)
    embeddings
      .withColumn("similarity", Similarity.cosineFast(col("embedding"), q))
      .orderBy(col("similarity").desc, col(idCol))
      .limit(topK)
      .select(col(idCol), round(col("similarity"), 6).as("similarity"))
  }

  /** Q4 vector variant `GraphRAG_Community_Vector_Search`
    * (`GraphRAG_Community_Vector_Search.gsql:24-67`): seed communities by
    * embedding similarity instead of by id, then the same HAS_PARENT descent
    * + member/chunk context gather as [[communitySearch]].
    */
  def communityVectorSearch(
      communities: DataFrame, communityEmbeddings: DataFrame,
      hasParent: DataFrame, inCommunity: DataFrame,
      resolvesTo: DataFrame, mentions: DataFrame, chunks: DataFrame,
      queryVec: Array[Float], topKSeeds: Int): DataFrame = {
    val seeds = vectorSeeds(communityEmbeddings, queryVec, topKSeeds, "community_id")
      .select(col("community_id")).collect().map(_.getString(0)).toSeq
    communitySearch(communities, hasParent, inCommunity, resolvesTo, mentions,
      chunks, seeds)
  }

  /** Q3 vector variant `Chunk_Sibling_Vector_Search`: seed chunks by
    * embedding similarity, then the ±window sibling expansion.
    */
  def siblingVectorSearch(chunks: DataFrame, chunkEmbeddings: DataFrame,
      queryVec: Array[Float], topKSeeds: Int,
      lookback: Int = 3, lookahead: Int = 3): DataFrame = {
    val seeds = vectorSeeds(chunkEmbeddings, queryVec, topKSeeds, "chunk_id")
      .select(col("chunk_id")).collect().map(_.getString(0)).toSeq
    siblingSearch(chunks, seeds, lookback, lookahead)
  }

  /** Q5 vector variant `GraphRAG_Hybrid_Vector_Search`: seed entities by
    * embedding similarity, then the typed BFS.
    */
  def hybridVectorSearch(edges: DataFrame, entityEmbeddings: DataFrame,
      queryVec: Array[Float], topKSeeds: Int,
      numHops: Int = 2, numSeenMin: Long = 1): DataFrame = {
    val seeds = vectorSeeds(entityEmbeddings, queryVec, topKSeeds, "entity_id")
      .select(col("entity_id")).collect().map(r => EntityPrefix + r.getString(0)).toSeq
    hybridExpandTyped(edges, seeds, numHops, numSeenMin)
  }

  /** Top-k window variant used when many query vectors are scored at once
    * (the per-query form of Q2, shared with Similarity.bruteForceTopK).
    */
  def topKPerQuery(scored: DataFrame, k: Int,
      queryCol: String = "query_id", scoreCol: String = "cos",
      tieCol: String = "neighbor_id"): DataFrame = {
    val w = Window.partitionBy(col(queryCol)).orderBy(col(scoreCol).desc, col(tieCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** BM25 lexical top-k over a document corpus (Robertson/Spärck Jones;
    * the Lucene `ln(1 + (N − df + ½)/(df + ½))` idf form, always
    * positive). `queries` is (query_id, term), one row per query term;
    * returns (query_id, rank, doc_id, score), rank 1..k.
    *
    * Plan, sized for a web corpus where |query terms| ≪ |vocabulary|:
    * the distinct query-term set is BROADCAST and tokens are filtered
    * against it before any shuffle, so the tf aggregation (the only
    * corpus-sized wide op) shuffles only matching (doc, term) rows; df,
    * the corpus stats (one row), and the per-term query fan-out are all
    * broadcast joins; doc length is a map-side expression on the original
    * docs, never re-aggregated from tokens. Per-query ranking is a salted
    * TWO-PHASE top-k — rank within (query, salt-of-64) partitions first,
    * then rank the ≤ 64·k survivors per query — so one popular query
    * never pins a single window partition to one task at corpus scale.
    *
    * Ordering is by score ROUNDED to 9 decimals (ties then by doc_id):
    * BM25 sums floating per-term weights, and summation order is
    * engine/partitioning-dependent — exact duplicate documents can land
    * 1-ulp apart in one engine and exactly equal in another, flipping
    * ranks. 1e-9 collapses ulp noise while preserving every real score
    * distinction, making the ranking bit-stable across partitionings AND
    * exactly reproducible by the DuckDB oracle (q_bm25).
    */
  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher SIGIR'09) of several
    * per-query rankings — the standard way to combine BM25 and
    * vector-similarity lists into one hybrid retrieval result.
    * `rankings` is (query_id, doc_id, rank[, …]) — the union of the input
    * lists, one row per (list, query, doc); a doc appearing in several
    * lists sums its 1/(c + rank) contributions. Returns
    * (query_id, rank, doc_id, rrf), rank 1..k.
    *
    * Scale: one (query_id, doc_id) aggregation over rows that are ALREADY
    * top-k-bounded per source list (≤ sources·k rows per query), then the
    * same salted two-phase ranking as [[bm25TopK]]. Ordering uses the
    * 1e-9-rounded fused score (ties by doc_id): 1/(c+rank) divisions are
    * correctly-rounded IEEE and thus engine-identical, but their SUM is
    * order-dependent — rounding makes the ranking partitioning- and
    * engine-stable (q_rrf_fusion replicates it exactly in DuckDB).
    */
  def rrfFuse(rankings: DataFrame, k: Int = 10, c: Double = 60.0): DataFrame = {
    val fused = rankings
      .select(col("query_id"), col("doc_id"),
        (lit(1.0) / (col("rank").cast("double") + c)).as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf"))
      .withColumn("rscore", round(col("rrf"), 9))
    val pre = Window.partitionBy(col("query_id"), crc32(col("doc_id")) % 64)
      .orderBy(col("rscore").desc, col("doc_id").asc)
    val fin = Window.partitionBy(col("query_id"))
      .orderBy(col("rscore").desc, col("doc_id").asc)
    fused
      .withColumn("prerank", row_number().over(pre)).where(col("prerank") <= k)
      .withColumn("rank", row_number().over(fin)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
  }

  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.operators.TextStats
    val dl = docs.select(col("doc_id").cast("string").as("doc_id"),
      TextStats.tokenCountCol(col("text")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val toks = docs.select(col("doc_id").cast("string").as("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .where(col("term") =!= "")
    val qterms = queries.select(col("term")).distinct()
    val tf = toks.join(broadcast(qterms), "term")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(queries), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + (lit(1 - b) + col("dl") / col("avgdl") * b) * k1))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
      .withColumn("rscore", round(col("score"), 9))
    val pre = Window.partitionBy(col("query_id"), crc32(col("doc_id")) % 64)
      .orderBy(col("rscore").desc, col("doc_id").asc)
    val fin = Window.partitionBy(col("query_id"))
      .orderBy(col("rscore").desc, col("doc_id").asc)
    scored
      .withColumn("prerank", row_number().over(pre)).where(col("prerank") <= k)
      .withColumn("rank", row_number().over(fin)).where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
