package graft.retrieval

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extract.{HashEmbedder, LlmClient}
import RetrieverDriver._

/** Q7 — retriever drivers over an injected deterministic LLM. Each fake
  * answers by prompt shape, exactly the dispatch surface the reference
  * drivers exercise (`BaseRetriever.py:55-186`).
  */
class RetrieverDriverSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val embedder = new HashEmbedder(64, 42)
  private val embed: String => Array[Float] = embedder.embed

  /** Routes on the distinguishing phrase of each default prompt template. */
  private object FakeLlm extends LlmClient {
    def complete(prompt: String): String =
      if (prompt.contains("generating an answer to the question below using the data provided")) {
        // scoring (map) step: score derived from the context slot so two
        // contexts rank deterministically differently
        val ctx = prompt.split("Context: ", 2)(1).split("\n")(0)
        s"""{"answer": "ans-${ctx.length}", "quality_score": ${ctx.length % 101}}"""
      } else if (prompt.contains("Extract a knowledge graph"))
        """{"nodes": [{"id": "alpha ent", "node_type": "org", "definition": "d"}],
            "rels": [{"source": "alpha ent", "target": "beta ent",
                      "relation_type": "works at", "definition": "d"}]}"""
      else if (prompt.contains("generating 10 new questions"))
        """{"candidates": [
            {"candidate": "who does alpha work for", "quality_score": 80},
            {"candidate": "alpha beta gamma", "quality_score": 95},
            {"candidate": "irrelevant zebra", "quality_score": 10}]}"""
      else if (prompt.contains("extracting key terms"))
        """```json
          {"candidates": [
            {"candidate": "beta", "quality_score": 90},
            {"candidate": "alpha", "quality_score": 70}]}
          ```"""
      else if (prompt.contains("writing an example of a document"))
        "alpha beta gamma"
      else if (prompt.startsWith("Answer this question:"))
        "ANSWER[" + prompt.length + "]"
      else "{}"
  }

  private def chunks = Seq(
    ("d1", 0, "d1_chunk_0", "alpha beta gamma"),
    ("d1", 1, "d1_chunk_1", "beta delta"),
    ("d2", 0, "d2_chunk_0", "zeta eta theta"))
    .toDF("doc_id", "idx", "chunk_id", "text")

  /** (id, embedding, content) chunk-embedding store, embedder-derived. */
  private def withEmbeddings = {
    val rows = Seq(
      ("d1_chunk_0", "alpha beta gamma"),
      ("d1_chunk_1", "beta delta"),
      ("d2_chunk_0", "zeta eta theta"))
    rows.map { case (id, t) => (id, embed(t), t) }
      .toDF("id", "embedding", "content")
  }

  test("parseCandidates: plain, fenced, and malformed payloads") {
    val plain = parseCandidates(
      """{"candidates": [{"candidate": "a", "quality_score": 5}]}""")
    assert(plain == Seq(Candidate("a", 5)))
    val fenced = parseCandidates(
      "```json\n{\"candidates\": [{\"candidate\": \"b\", \"quality_score\": 7}]}\n```")
    assert(fenced == Seq(Candidate("b", 7)))
    assert(parseCandidates("not json").isEmpty)
    assert(parseCandidates("""{"candidates": [{"candidate": "x"}]}""").isEmpty)
  }

  test("expandQuestion sorts by quality desc and truncates to top_k") {
    assert(expandQuestion(FakeLlm, "q", 2) ==
      Seq("alpha beta gamma", "who does alpha work for"))
    assert(expandQuestion(FakeLlm, "q", 10).sizeIs == 3)
  }

  test("questionToKeywords formats a question LIST python-style into the slot") {
    // single question goes in bare; the fake returns score-sorted keywords
    assert(questionToKeywords(FakeLlm, Seq("q"), 5) == Seq("beta", "alpha"))
    // list repr matches Python str(list) for the multi-question hybrid path
    assert(pyListRepr(Seq("a", "it's")) == "['a', 'it\\'s']")
  }

  test("hydeEmbedding embeds the LLM's hypothetical document, not the question") {
    val hyde = hydeEmbedding(FakeLlm, embed, "completely unrelated question")
    assert(hyde.sameElements(embed("alpha beta gamma")))
    assert(!hyde.sameElements(embed("completely unrelated question")))
  }

  test("generateStartSet merges per-question candidates, dedups by max score, truncates") {
    val typed = withEmbeddings.select($"id", lit("DocumentChunk").as("vtype"), $"embedding")
    // two questions that both hit d1_chunk_0 hardest; threshold excludes zeta row
    val seeds = generateStartSet(Seq("alpha beta gamma", "beta delta"), typed,
      FakeLlm, embed, topK = 2, similarityThreshold = 0.5)
    assert(seeds.sizeIs <= 2)
    assert(seeds.map(_.id).contains("d1_chunk_0"))
    // dedup keeps one row per (id, vtype)
    assert(seeds.map(s => (s.id, s.vtype)).distinct.size == seeds.size)
    // scores descend
    assert(seeds.map(_.score) == seeds.map(_.score).sorted.reverse)
    // an impossible threshold yields no seeds
    assert(generateStartSet(Seq("alpha"), typed, FakeLlm, embed, 2,
      similarityThreshold = 1.1).isEmpty)
  }

  test("generateResponse formats the reference response prompt") {
    var captured: String = null
    val spy = new LlmClient { def complete(p: String): String = { captured = p; "ok" } }
    val ans = generateResponse(spy, "why?", Seq("s1", "s2"))
    assert(ans.response == "ok" && ans.retrieved == Seq("s1", "s2"))
    assert(captured == "Answer this question: why?\nUse this information: ['s1', 's2']")
  }

  test("similarityRetrieveAnswer: plain, HyDE, combine, and expand paths") {
    val docs = Seq.empty[(String, String)].toDF("doc_id", "text")
    val entities = Seq.empty[(String, Seq[String])].toDF("entity_id", "descriptions")
    val communities = Seq.empty[(String, String)].toDF("community_id", "description")
    // plain: question embeds straight; top-1 is the exact-text chunk
    val plain = similarityRetrieveAnswer("beta delta", withEmbeddings, chunks,
      docs, entities, communities, FakeLlm, embed, topK = 1)
    assert(plain.retrieved == Seq("beta delta"))
    assert(plain.response.startsWith("ANSWER["))
    // HyDE: the fake's hypothetical doc is "alpha beta gamma", so the SAME
    // question now retrieves the alpha chunk — the HyDE vector drives search
    val hyde = similarityRetrieveAnswer("beta delta", withEmbeddings, chunks,
      docs, entities, communities, FakeLlm, embed, topK = 1, withHyDE = true)
    assert(hyde.retrieved == Seq("alpha beta gamma"))
    // combine joins the contexts into one source
    val comb = similarityRetrieveAnswer("beta delta", withEmbeddings, chunks,
      docs, entities, communities, FakeLlm, embed, topK = 2, combine = true)
    assert(comb.retrieved.sizeIs == 1 && comb.retrieved.head.contains("\n"))
    // expand: fake expansion's top question is "alpha beta gamma" -> start
    // set seeds the alpha chunk -> contentFetch returns its text
    val exp = similarityRetrieveAnswer("anything", withEmbeddings, chunks,
      docs, entities, communities, FakeLlm, embed, topK = 1, expand = true)
    assert(exp.retrieved == Seq("alpha beta gamma"))
  }

  test("hybridRetrieveAnswer: vector path and keyword-expand path") {
    // planted graph: alpha_ent mentioned by d1_chunk_0; relationship to beta_ent
    val triples = Seq(("alpha_ent", "WORKS_AT", "beta_ent", "d1_chunk_0"))
      .toDF("subj", "pred", "obj", "chunk_id")
    val mentions = Seq(("d1_chunk_0", "alpha_ent")).toDF("chunk_id", "entity_id")
    val edges = Retrieval.typedEdges(triples, mentions, chunks)
    val entities = Seq(("alpha_ent", Seq("first letter")), ("beta_ent", Seq("second letter")))
      .toDF("entity_id", "descriptions")
    val entityEmbeddings = Seq(
      ("alpha_ent", embed("alpha beta gamma")),
      ("beta_ent", embed("zeta eta theta"))).toDF("entity_id", "embedding")
    // vector path: question lands on alpha_ent, 2-hop walk reaches the
    // relationship vertex, beta_ent, and the mention chunk
    val ans = hybridRetrieveAnswer("alpha beta gamma", edges, entityEmbeddings,
      chunks, entities, FakeLlm, embed, topK = 1, numHops = 2)
    val all = ans.retrieved.mkString("\n")
    assert(all.contains("Entity: alpha ent") && all.contains("WORKS_AT"))
    assert(ans.retrieved.sizeIs == 3) // one grouped context per vtype C/E/R
    // combine flattens to one deterministic source
    val comb = hybridRetrieveAnswer("alpha beta gamma", edges, entityEmbeddings,
      chunks, entities, FakeLlm, embed, topK = 1, numHops = 2, combine = true)
    assert(comb.retrieved.sizeIs == 1)
    // keyword-expand path: fake keywords (beta, alpha) hit chunks by text,
    // seeding C: vertices — the walk then reaches the mentioned entity
    val kw = hybridRetrieveAnswer("anything", edges, entityEmbeddings, chunks,
      entities, FakeLlm, embed, topK = 2, numHops = 2, expand = true,
      method = "keywords")
    assert(kw.retrieved.exists(_.contains("alpha ent")))
  }

  test("communityRetrieveAnswer: level seeds, descent context, map-reduce scoring") {
    // two level-1 communities; c2 is the parent-level seed target at level 2
    val communities = Seq(("c1", 1, "desc one"), ("c1b", 1, "desc oneb"),
      ("c2", 2, "desc two")).toDF("community_id", "iteration", "description")
    val hasParent = Seq(("c1", "c2"), ("c1b", "c2")).toDF("community_id", "parent_id")
    val inCommunity = Seq(("c1", "alpha_ent"), ("c1b", "zeta_ent"))
      .toDF("community_id", "canonical_id")
    val resolvesTo = Seq(("alpha_ent", "alpha_ent"), ("zeta_ent", "zeta_ent"))
      .toDF("canonical_id", "entity_id")
    val mentions = Seq(("d1_chunk_0", "alpha_ent"), ("d2_chunk_0", "zeta_ent"))
      .toDF("chunk_id", "entity_id")
    val communityEmbeddings = Seq(
      ("c1", embed("alpha beta gamma")), ("c1b", embed("zeta eta theta")),
      ("c2", embed("alpha beta gamma"))).toDF("community_id", "embedding")
    // vector path at level 1: question seeds c1 -> member alpha_ent ->
    // its mention chunk text is the context
    val ans = communityRetrieveAnswer("alpha beta gamma", communities,
      communityEmbeddings, hasParent, inCommunity, resolvesTo, mentions,
      chunks, FakeLlm, embed, communityLevel = 1, topK = 1)
    // the map step answered over the c1 context; retrieved = candidate answers
    assert(ans.retrieved.sizeIs == 1 && ans.retrieved.head.startsWith("ans-"))
    assert(ans.response.startsWith("ANSWER["))
    // level-2 seed descends HAS_PARENT to BOTH level-1 children's contexts,
    // and topK=2 keeps two scored candidates sorted by quality desc
    val l2 = communityRetrieveAnswer("alpha beta gamma", communities,
      communityEmbeddings, hasParent, inCommunity, resolvesTo, mentions,
      chunks, FakeLlm, embed, communityLevel = 2, topK = 2)
    assert(l2.retrieved.sizeIs == 1) // one seed community -> one context -> one candidate
    // expand path with threshold: start set over level-1 community embeddings
    val exp = communityRetrieveAnswer("alpha beta gamma", communities,
      communityEmbeddings, hasParent, inCommunity, resolvesTo, mentions,
      chunks, FakeLlm, embed, communityLevel = 1, topK = 2,
      similarityThreshold = 0.5, expand = true)
    assert(exp.retrieved.nonEmpty)
  }

  test("siblingRetrieveAnswer: window contents in chain order, sibling combine separator") {
    val chunkEmbeddings = Seq(
      ("d1_chunk_0", embed("alpha beta gamma")),
      ("d1_chunk_1", embed("beta delta")),
      ("d2_chunk_0", embed("zeta eta theta"))).toDF("chunk_id", "embedding")
    // seed d1_chunk_1; window [-1,+1] gathers chunk 0 and 1 in chain order
    val ans = siblingRetrieveAnswer("beta delta", chunks, chunkEmbeddings,
      FakeLlm, embed, topK = 1, lookback = 1, lookahead = 1)
    assert(ans.retrieved == Seq("alpha beta gamma\nbeta delta"))
    // two seeds + combine: reference's sibling separator is "\n " (py:72)
    val comb = siblingRetrieveAnswer("beta delta", chunks, chunkEmbeddings,
      FakeLlm, embed, topK = 2, lookback = 0, lookahead = 0, combine = true)
    assert(comb.retrieved.sizeIs == 1 && comb.retrieved.head.contains("\n "))
  }

  test("entityRelationshipRetrieveAnswer: extracts seeds from the question itself") {
    val entities = Seq("alpha_ent", "beta_ent").toDF("entity_id")
    val mentions = Seq(("d1_chunk_0", "alpha_ent")).toDF("chunk_id", "entity_id")
    val triples = Seq(("alpha_ent", "WORKS_AT", "beta_ent", "d1_chunk_1"))
      .toDF("subj", "pred", "obj", "chunk_id")
    // the fake extractor returns alpha ent + "works at": normalization gives
    // entity id alpha_ent (mention chunk 0 touched directly) and relation
    // WORKS_AT (provenance chunk 1 touched directly)
    val ans = entityRelationshipRetrieveAnswer("who works at alpha?", entities,
      mentions, chunks, triples, FakeLlm, topK = 5)
    assert(ans.retrieved.sizeIs == 2) // d1's chunks 0 (mention) and 1 (provenance)
    assert(ans.response.startsWith("ANSWER["))
  }
}
