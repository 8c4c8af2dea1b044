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
    * (`Entity_Relationship_Retrieval.gsql:17-52`): LIKE-match seed entities,
    * hop to their chunks via CONTAINS_ENTITY, score chunks by how many seed
    * entities touch them, top-k with content.
    */
  def entityRelationshipRetrieval(entities: DataFrame, mentions: DataFrame,
      chunks: DataFrame, likePattern: String, topK: Int = 5): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    val seeds = entities.where(lower($"entity_id").like(likePattern.toLowerCase))
      .select($"entity_id")
    mentions.join(seeds, "entity_id")
      .groupBy($"chunk_id")
      .agg(count(lit(1)).as("touch_count"))
      .join(chunks.select($"chunk_id", $"text"), "chunk_id")
      .orderBy($"touch_count".desc, $"chunk_id")
      .limit(topK)
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
}
