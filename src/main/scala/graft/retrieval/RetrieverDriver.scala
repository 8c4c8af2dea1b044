package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.extract.LlmClient

/** Q7 — the retriever DRIVER layer (reference
  * `graphrag/app/supportai/retrievers/BaseRetriever.py:55-221`,
  * `SimilarityRetriever.py:16-70`, `HybridRetriever.py:15-104`): the
  * per-request orchestration that sits ABOVE the distributed search
  * operators (Q1–Q6) — LLM question expansion, LLM keyword extraction,
  * HyDE query embedding, multi-question start-set generation, and the
  * final LLM answer step over the retrieved context.
  *
  * All LLM calls go through the same injectable [[LlmClient]] the E2
  * extractor uses; the embedding step through an injectable
  * `String => Array[Float]` (production: provider client; tests and the
  * gate queries: the deterministic [[graft.extract.HashEmbedder]]). Every
  * piece of the flow that touches data stays a Dataset operator from
  * [[Retrieval]] — this layer only sequences scalar per-question calls,
  * exactly like the reference driver (one request, one question, bounded
  * top_k), so nothing here is on the 100 TB data path.
  *
  * Two deliberate deterministic refinements of reference behavior, both
  * documented at the call site: the reference dedups its start set through
  * a Python set comprehension (`BaseRetriever.py:219` — iteration order
  * arbitrary) and combines hybrid context through `"\n".join(set(...))`
  * (`HybridRetriever.py:97`); we keep the same elements but fix the order
  * (score-desc / sorted) so results are reproducible.
  */
object RetrieverDriver {

  /** One scored candidate from the CandidateGenerator tool schema
    * (`common/py_schemas/tool_io_schemas.py:122-128`).
    */
  final case class Candidate(candidate: String, qualityScore: Int)

  /** A typed start-set seed `{"v": id, "t": vertex_type}`
    * (`BaseRetriever.py:218`).
    */
  final case class Seed(id: String, vtype: String, score: Double)

  // ---- default prompt templates (base_llm.py verbatim) -------------------

  /** `base_llm.py:125-126`. */
  val HydePrompt: String =
    """You are a helpful agent that is writing an example of a document that might answer this question: {question}
                  Answer:"""

  /** `base_llm.py:136`. */
  val ResponsePrompt: String =
    "Answer this question: {question}\nUse this information: {sources}"

  /** `base_llm.py:152`. */
  val KeywordExtractionPrompt: String =
    "You are a helpful assistant responsible for extracting key terms (glossary) from all the questions below to represent their original meaning as much as possible. Each term should only contain a couple of words. Include a quality score for the each extracted glossary, based on how important and frequent it's in the given questions. The quality score should range from 0 (poor) to 100 (excellent), with higher scores indicating terms that are both significant and frequent in the context of the questions.\nThe output should only contain the extracted terms and their quality scores using the required format.\n\nQuestion: {question}\n\n{format_instructions}\n"

  /** `base_llm.py:160-161` — the CommunityRetriever's per-context scoring
    * (map) step.
    */
  val GraphragScoringPrompt: String =
    "You are a helpful assistant responsible for generating an answer to the question below using the data provided.\nInclude a quality score for the answer, based on how well it answers the question. The quality score should be between 0 (poor) and 100 (excellent).\n\nQuestion: {question}\nContext: {context}\n\n{format_instructions}\n"

  /** `base_llm.py:157`. */
  val QuestionExpansionPrompt: String =
    "You are a helpful assistant responsible for generating 10 new questions similar to the original question below to represent its meaning in a more clear way.\nInclude a quality score for the answer, based on how well it represents the meaning of the original question. The quality score should be between 0 (poor) and 100 (excellent).\n\nQuestion: {question}\n\n{format_instructions}\n"

  /** The PydanticOutputParser format instructions the reference splices in
    * for CandidateGenerator — condensed to the schema line (the surrounding
    * boilerplate is LangChain-internal and carries no semantics).
    */
  val CandidateFormatInstructions: String =
    """Return JSON: {"candidates": [{"candidate": "...", "quality_score": 0-100}]}"""

  /** Python str() of a list of strings — the reference formats multi-question
    * prompt slots by str(list) (`HybridRetriever.py:22` passes the expanded
    * list straight into the `{question}` slot).
    */
  def pyListRepr(xs: Seq[String]): String =
    xs.map(s => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'")
      .mkString("[", ", ", "]")

  // ---- candidate parsing + scoring ---------------------------------------

  /** Parse a CandidateGenerator completion. Mirrors the extractor's fenced
    * unwrap, and like every reference parse path any failure yields empty,
    * never an exception.
    */
  def parseCandidates(raw: String): Seq[Candidate] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try {
      val body =
        if (raw.contains("```")) {
          val parts = raw.split("```", -1)
          if (parts.length > 1) parts(1).stripPrefix("json").trim else raw.trim
        } else raw.trim
      JsonMethods.parse(body) \ "candidates" match {
        case JArray(items) => items.flatMap { it =>
          val cand = it \ "candidate" match { case JString(s) => Some(s); case _ => None }
          val score = it \ "quality_score" match {
            case JInt(n) => Some(n.toInt)
            case JDouble(d) => Some(d.toInt)
            case _ => None
          }
          (cand, score) match { case (Some(c), Some(q)) => Some(Candidate(c, q)); case _ => None }
        }
        case _ => Nil
      }
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Shared candidate machinery: prompt → complete → parse → stable sort by
    * quality_score desc → top_k candidates (`BaseRetriever.py:85-91,120-125`
    * — Python's list.sort is stable, so ties keep completion order; Scala's
    * sortBy is stable too).
    */
  private def topCandidates(llm: LlmClient, template: String, question: String,
      topK: Int): Seq[String] = {
    val prompt = template
      .replace("{question}", question)
      .replace("{format_instructions}", CandidateFormatInstructions)
    parseCandidates(llm.complete(prompt))
      .sortBy(c => -c.qualityScore)
      .take(topK)
      .map(_.candidate)
  }

  /** `_expand_question` (`BaseRetriever.py:94-125`). */
  def expandQuestion(llm: LlmClient, question: String, topK: Int): Seq[String] =
    topCandidates(llm, QuestionExpansionPrompt, question, topK)

  /** `_question_to_keywords` (`BaseRetriever.py:55-91`) — the hybrid driver
    * passes the whole expanded-question LIST into the single prompt slot
    * (`HybridRetriever.py:22`), hence the Python list repr.
    */
  def questionToKeywords(llm: LlmClient, questions: Seq[String], topK: Int): Seq[String] =
    topCandidates(llm, KeywordExtractionPrompt,
      if (questions.sizeIs == 1) questions.head else pyListRepr(questions), topK)

  // ---- embeddings ---------------------------------------------------------

  /** `_hyde_embedding` (`BaseRetriever.py:167-186`): LLM writes a
    * hypothetical answer document, the EMBEDDING of that document becomes
    * the query vector.
    */
  def hydeEmbedding(llm: LlmClient, embed: String => Array[Float],
      question: String): Array[Float] =
    embed(llm.complete(HydePrompt.replace("{question}", question)))

  /** `_generate_start_set` (`BaseRetriever.py:195-221`): per question embed
    * (HyDE optional), retrieve top-k ≥ threshold from the typed embedding
    * store, merge all questions' candidates sorted by score desc, dedup
    * (id, type), truncate to top_k. `typedEmbeddings` is (id, vtype,
    * embedding). Reference dedups via a set comprehension with arbitrary
    * order (`:219`); we keep the max-score occurrence and score-desc order —
    * same seed SET, deterministic order.
    */
  def generateStartSet(questions: Seq[String], typedEmbeddings: DataFrame,
      llm: LlmClient, embed: String => Array[Float], topK: Int,
      similarityThreshold: Double = 0.90, withHyDE: Boolean = false): Seq[Seed] = {
    val perQuestion = questions.flatMap { q =>
      val vec = if (withHyDE) hydeEmbedding(llm, embed, q) else embed(q)
      typedEmbeddings
        .withColumn("similarity", graft.operators.Similarity.cosineFast(col("embedding"), lit(vec)))
        .where(col("similarity") >= similarityThreshold)
        .orderBy(col("similarity").desc, col("id"))
        .limit(topK)
        .select(col("id"), col("vtype"), col("similarity"))
        .collect()
        .map(r => Seed(r.getString(0), r.getString(1), r.getDouble(2)))
    }
    perQuestion
      .groupBy(s => (s.id, s.vtype)).values.map(_.maxBy(_.score)).toSeq
      .sortBy(s => (-s.score, s.id))
      .take(topK)
  }

  // ---- the answer step ----------------------------------------------------

  /** `_generate_response` (`BaseRetriever.py:127-158`): format the response
    * prompt with the question and the retrieved sources (Python str(list)
    * shape) and return the completion alongside what was retrieved.
    */
  def generateResponse(llm: LlmClient, question: String,
      retrieved: Seq[String]): RetrieverAnswer =
    renderResponse(llm, question, pyListRepr(retrieved), retrieved)

  private def renderResponse(llm: LlmClient, question: String,
      sourcesRepr: String, retrieved: Seq[String]): RetrieverAnswer = {
    val prompt = ResponsePrompt
      .replace("{question}", question)
      .replace("{sources}", sourcesRepr)
    RetrieverAnswer(llm.complete(prompt), retrieved)
  }

  final case class RetrieverAnswer(response: String, retrieved: Seq[String])

  // ---- community scoring (map-reduce answer) -------------------------------

  /** One scored per-community candidate answer — the CommunityAnswer tool
    * schema (`common/py_schemas/tool_io_schemas.py:130-133`).
    */
  final case class CommunityAnswer(answer: String, qualityScore: Int)

  /** Parse a CommunityAnswer completion; empty on any failure. */
  def parseCommunityAnswer(raw: String): Option[CommunityAnswer] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try {
      val body =
        if (raw.contains("```")) {
          val parts = raw.split("```", -1)
          if (parts.length > 1) parts(1).stripPrefix("json").trim else raw.trim
        } else raw.trim
      val json = JsonMethods.parse(body)
      val ans = json \ "answer" match { case JString(s) => Some(s); case _ => None }
      val score = json \ "quality_score" match {
        case JInt(n) => Some(n.toInt)
        case JDouble(d) => Some(d.toInt)
        case _ => None
      }
      (ans, score) match {
        case (Some(a), Some(q)) => Some(CommunityAnswer(a, q))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `_generate_candidate` + `gather_candidates`
    * (`CommunityRetriever.py:106-143`): one scoring completion PER context
    * — the map step of the community map-reduce answer. The reference runs
    * them concurrently via asyncio.gather; order is preserved there and
    * here.
    */
  def gatherCandidates(llm: LlmClient, question: String,
      contexts: Seq[String]): Seq[CommunityAnswer] =
    contexts.flatMap { c =>
      parseCommunityAnswer(llm.complete(GraphragScoringPrompt
        .replace("{question}", question)
        .replace("{context}", c)
        .replace("{format_instructions}",
          """Return JSON: {"answer": "...", "quality_score": 0-100}""")))
    }

  // ---- end-to-end drivers --------------------------------------------------

  /** SimilarityRetriever.retrieve_answer (`SimilarityRetriever.py:16-70`):
    * expand=false path embeds the question (HyDE optional) and runs the
    * vector search; expand=true path expands the question, builds a start
    * set over the chunk embeddings and fetches content by id
    * (Content_Similarity_Search). Context = retrieved contents, combined
    * into one source if `combine`.
    */
  def similarityRetrieveAnswer(question: String, withEmbeddings: DataFrame,
      chunks: DataFrame, docs: DataFrame, entities: DataFrame,
      communities: DataFrame, llm: LlmClient, embed: String => Array[Float],
      topK: Int = 1, withHyDE: Boolean = false, expand: Boolean = false,
      combine: Boolean = false,
      similarityThreshold: Double = 0.90): RetrieverAnswer = {
    val contents: Seq[String] =
      if (expand) {
        val questions = expandQuestion(llm, question, topK)
        val typed = withEmbeddings.select(col("id"), lit("DocumentChunk").as("vtype"), col("embedding"))
        val seeds = generateStartSet(questions, typed, llm, embed, topK,
          similarityThreshold, withHyDE = withHyDE)
        if (seeds.isEmpty) Nil
        else Retrieval.contentFetch(seeds.map(s => (s.id, s.vtype)), chunks, docs,
            entities, communities)
          .orderBy(col("id")).collect().map(_.getAs[String]("content")).toSeq
      } else {
        val vec = if (withHyDE) hydeEmbedding(llm, embed, question) else embed(question)
        Retrieval.contentSimilaritySearch(withEmbeddings, vec, topK)
          .collect().map(_.getAs[String]("content")).toSeq
      }
    val context = if (combine) Seq(contents.mkString("\n")) else contents
    generateResponse(llm, question, context)
  }

  /** HybridRetriever.retrieve_answer (`HybridRetriever.py:15-104`):
    * expand=true seeds from expanded questions — by extracted keywords
    * (method "keywords"), by embedding start set ("similarity"), or both —
    * then runs the typed k-hop hybrid expansion; expand=false embeds the
    * question and runs the vector-seeded hybrid search. Context is the
    * per-type grouped expansion contexts; `combine` flattens to one source
    * (reference uses "\n".join(set(...)) `HybridRetriever.py:97` — same
    * elements here, sorted for determinism).
    */
  def hybridRetrieveAnswer(question: String, edges: DataFrame,
      entityEmbeddings: DataFrame, chunks: DataFrame, entities: DataFrame,
      llm: LlmClient, embed: String => Array[Float], topK: Int = 5,
      similarityThreshold: Double = 0.90, numHops: Int = 2,
      numSeenMin: Long = 1, expand: Boolean = false,
      method: String = "similarity", combine: Boolean = false): RetrieverAnswer = {
    val expanded: DataFrame =
      if (expand) {
        val questions = expandQuestion(llm, question, topK)
        val m = method.toLowerCase
        val keywordSeeds: Seq[String] =
          if (m == "keywords" || m == "both" || m == "all") {
            val kws = questionToKeywords(llm, questions, topK)
            if (kws.isEmpty) Nil
            else Retrieval.keywordSearch(chunks, kws, "ANY", topK)
              .collect().map(r => Retrieval.ChunkPrefix + r.getAs[String]("chunk_id")).toSeq
          } else Nil
        val vectorSeeds: Seq[String] =
          if (m == "keywords") Nil
          else {
            val typed = entityEmbeddings.select(col("entity_id").as("id"),
              lit("Entity").as("vtype"), col("embedding"))
            generateStartSet(questions, typed, llm, embed, topK, similarityThreshold)
              .map(s => Retrieval.EntityPrefix + s.id)
          }
        val seeds = (keywordSeeds ++ vectorSeeds).distinct
        Retrieval.hybridExpandTyped(edges, seeds, numHops, numSeenMin)
      } else {
        Retrieval.hybridVectorSearch(edges, entityEmbeddings, embed(question),
          topK, numHops, numSeenMin)
      }
    val ctxRows = Retrieval.hybridContext(expanded, entities, chunks)
      .select(col("vtype"), col("context")).collect()
    val byType = ctxRows.groupBy(_.getString(0))
    val context: Seq[String] =
      if (combine) Seq(ctxRows.map(_.getString(1)).distinct.sorted.mkString("\n"))
      else byType.toSeq.sortBy(_._1)
        .map { case (_, rows) => rows.map(_.getString(1)).distinct.sorted.mkString("\n") }
    generateResponse(llm, question, context)
  }

  /** CommunityRetriever.retrieve_answer (`CommunityRetriever.py:41-181`):
    * seed communities at `communityLevel` (vector search, or question
    * expansion + start set — the reference's level filter is a vertex-id
    * suffix LIKE `:46-50`; here the `iteration` column, same predicate),
    * descend to level-1 members and gather their chunk context, then the
    * map-reduce answer: ONE scoring completion per community context
    * (CommunityAnswer with quality_score), keep the top_k candidates by
    * score, and answer over `{'candidate_answer': ..., 'score': ...}`
    * dicts (`:156-166` — the reference formats that python list-of-dicts
    * into the response prompt).
    */
  def communityRetrieveAnswer(question: String, communities: DataFrame,
      communityEmbeddings: DataFrame, hasParent: DataFrame,
      inCommunity: DataFrame, resolvesTo: DataFrame, mentions: DataFrame,
      chunks: DataFrame, llm: LlmClient, embed: String => Array[Float],
      communityLevel: Int, topK: Int = 1, similarityThreshold: Double = 0.90,
      expand: Boolean = false, combine: Boolean = false): RetrieverAnswer = {
    val levelIds = communities.where(col("iteration") === communityLevel)
      .select(col("community_id"))
    val levelEmb = communityEmbeddings
      .join(levelIds, "community_id")
    val searched: DataFrame =
      if (expand) {
        val questions = expandQuestion(llm, question, topK)
        val typed = levelEmb.select(col("community_id").as("id"),
          lit("Community").as("vtype"), col("embedding"))
        val seeds = generateStartSet(questions, typed, llm, embed, topK,
          similarityThreshold)
        Retrieval.communitySearch(communities, hasParent, inCommunity,
          resolvesTo, mentions, chunks, seeds.map(_.id))
      } else
        Retrieval.communityVectorSearch(communities, levelEmb, hasParent,
          inCommunity, resolvesTo, mentions, chunks, embed(question), topK)
    // final_retrieval: per seed community, its chunk texts + description
    val rows = searched
      .select(col("seed_community_id"), col("text"), col("description"))
      .collect()
    val bySeed = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.map(_.getString(2)).distinct ++ rs.map(_.getString(1)).distinct.sorted)
          .mkString("\n")
      }
    val context = if (combine) Seq(bySeed.mkString("\n")) else bySeed
    val candidates = gatherCandidates(llm, question, context)
      .sortBy(c => -c.qualityScore).take(topK)
    val newContext = candidates.map(c =>
      s"{'candidate_answer': ${pyListRepr(Seq(c.answer)).stripPrefix("[").stripSuffix("]")}, 'score': ${c.qualityScore}}")
    renderResponse(llm, question, newContext.mkString("[", ", ", "]"),
      candidates.map(_.answer))
  }

  /** SiblingRetriever.retrieve_answer (`SiblingRetriever.py:16-80`): seed
    * chunks (vector/HyDE, or expansion + start set), expand each seed to
    * its ±window siblings, join each seed's sibling CONTENTS in chain
    * order, `"\n "`-join on combine (the reference's sibling combine
    * separator differs from the others — `:72`).
    */
  def siblingRetrieveAnswer(question: String, chunks: DataFrame,
      chunkEmbeddings: DataFrame, llm: LlmClient,
      embed: String => Array[Float], topK: Int = 1, lookback: Int = 3,
      lookahead: Int = 3, withHyDE: Boolean = false, expand: Boolean = false,
      combine: Boolean = false): RetrieverAnswer = {
    val searched: DataFrame =
      if (expand) {
        val questions = expandQuestion(llm, question, topK)
        val typed = chunkEmbeddings.select(col("chunk_id").as("id"),
          lit("DocumentChunk").as("vtype"), col("embedding"))
        val seeds = generateStartSet(questions, typed, llm, embed, topK,
          withHyDE = withHyDE)
        Retrieval.siblingSearch(chunks, seeds.map(_.id), lookback, lookahead)
      } else {
        val vec = if (withHyDE) hydeEmbedding(llm, embed, question) else embed(question)
        Retrieval.siblingVectorSearch(chunks, chunkEmbeddings, vec, topK,
          lookback, lookahead)
      }
    val rows = searched
      .select(col("seed_chunk_id"), col("distance"), col("text")).collect()
    val bySeed = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getLong(1)).map(_.getString(2)).mkString("\n")
      }
    val context = if (combine) Seq(bySeed.mkString("\n ")) else bySeed
    generateResponse(llm, question, context)
  }

  /** EntityRelationshipRetriever.retrieve_answer
    * (`EntityRelationshipRetriever.py:18-33`): run the LLM graph EXTRACTOR
    * over the QUESTION itself, seed the retrieval with the extracted entity
    * ids and relation types (exact matches — the GSQL takes id lists, not
    * patterns), answer over the touched chunks' text.
    */
  def entityRelationshipRetrieveAnswer(question: String, entities: DataFrame,
      mentions: DataFrame, chunks: DataFrame, triples: DataFrame,
      llm: LlmClient, topK: Int = 1): RetrieverAnswer = {
    val doc = new graft.extract.JsonLlmExtractor(llm).extract("question", question)
    val entityIds = doc.nodes.map(_.id).filter(_.nonEmpty).distinct
    val relTypes = doc.rels.map(_.relation_type).filter(_.nonEmpty).distinct
    val retrieved: Seq[String] =
      if (entityIds.isEmpty && relTypes.isEmpty) Nil
      else Retrieval.entityRelationshipRetrieval(entities, mentions, chunks,
          triples, entityIds, relTypes, topK)
        .select(col("text")).collect().map(_.getString(0)).toSeq
    generateResponse(llm, question, retrieved)
  }
}
