package graft.extract

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ExtractedNode, ExtractedRel}

class JsonLlmExtractorSpec extends AnyFunSuite {

  private def clientReturning(s: String): LlmClient = new LlmClient {
    override def complete(prompt: String): String = s
  }

  test("parses bare KnowledgeGraph JSON with type normalization") {
    val out =
      """{"nodes": [{"id": "Marie Curie", "node_type": "famous person", "definition": "physicist"}],
        |"rels": [{"source": "Marie Curie", "target": "Pierre Curie",
        |          "relation_type": "spouse of", "definition": "married"}]}""".stripMargin
    val ex = new JsonLlmExtractor(clientReturning(out))
    val doc = ex.extract("c1", "whatever")
    assert(doc.nodes == Seq(ExtractedNode("Marie Curie", "Famous_person", "physicist")))
    assert(doc.rels == Seq(ExtractedRel("Marie Curie", "Pierre Curie", "SPOUSE_OF", "married")))
  }

  test("unwraps ```json fenced output like the reference parser") {
    val fenced =
      "Here you go:\n```json\n{\"nodes\": [{\"id\": \"X\", \"node_type\": \"t\", " +
        "\"definition\": \"d\"}], \"rels\": []}\n```\ndone"
    val doc = new JsonLlmExtractor(clientReturning(fenced)).extract("c", "t")
    assert(doc.nodes.map(_.id) == Seq("X"))
  }

  test("rel endpoints accept Node objects or bare strings") {
    val out =
      """{"nodes": [], "rels": [
        |  {"source": {"id": "A", "node_type": "T"}, "target": "B",
        |   "relation_type": "works at", "definition": ""},
        |  {"source": "C", "target": {"id": "D"}, "relation_type": "near", "definition": ""}
        |]}""".stripMargin
    val doc = new JsonLlmExtractor(clientReturning(out)).extract("c", "t")
    assert(doc.rels.map(r => (r.source, r.target, r.relation_type)) ==
      Seq(("A", "B", "WORKS_AT"), ("C", "D", "NEAR")))
  }

  test("malformed output and client failure yield empty docs, never throw") {
    assert(new JsonLlmExtractor(clientReturning("not json at all")).extract("c", "t").nodes.isEmpty)
    assert(new JsonLlmExtractor(clientReturning("{\"nodes\": 42}")).extract("c", "t").nodes.isEmpty)
    val boom = new LlmClient { def complete(p: String) = throw new RuntimeException("down") }
    val doc = new JsonLlmExtractor(boom).extract("c", "t")
    assert(doc.nodes.isEmpty && doc.rels.isEmpty && doc.chunk_id == "c")
  }

  test("strict_mode filters planted off-schema types on the NORMALIZED form") {
    // one on-schema node, one off-schema node ("alien device"), one
    // on-schema rel, one off-schema rel — mirrors
    // LLMEntityRelationshipExtractor.py:113-125
    val out =
      """{"nodes": [
        |  {"id": "Marie Curie", "node_type": "famous person", "definition": "p"},
        |  {"id": "Orb", "node_type": "alien device", "definition": "x"}],
        |"rels": [
        |  {"source": "Marie Curie", "target": "Sorbonne", "relation_type": "works at", "definition": ""},
        |  {"source": "Orb", "target": "Sorbonne", "relation_type": "hovers over", "definition": ""}
        |]}""".stripMargin
    val strict = new JsonLlmExtractor(clientReturning(out),
      allowedEntityTypes = Seq("Famous_person", "Org"),
      allowedRelationshipTypes = Seq("WORKS_AT"),
      strictMode = true)
    val doc = strict.extract("c", "t")
    assert(doc.nodes.map(_.id) == Seq("Marie Curie"))
    assert(doc.rels.map(_.relation_type) == Seq("WORKS_AT"))
    // strict_mode with EMPTY allow-lists filters nothing (reference: each
    // list gates its own filter)
    val strictNoLists = new JsonLlmExtractor(clientReturning(out), strictMode = true)
    val doc2 = strictNoLists.extract("c", "t")
    assert(doc2.nodes.size == 2 && doc2.rels.size == 2)
    // strict off: allow-lists alone do nothing
    val loose = new JsonLlmExtractor(clientReturning(out),
      allowedEntityTypes = Seq("Famous_person"))
    assert(loose.extract("c", "t").nodes.size == 2)
  }

  test("runs inside the extraction stage with a deterministic fake backend") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // fake "LLM": deterministically derives one node from the chunk text
    val fake = new LlmClient {
      def complete(prompt: String): String = {
        val word = prompt.split("Text: ").last.trim.split("\\s+").head
        s"""{"nodes": [{"id": "$word", "node_type": "token", "definition": "d"}], "rels": []}"""
      }
    }
    val chunks = Seq(
      graft.model.Chunk("d", 0, "d_chunk_0", "alpha beta"),
      graft.model.Chunk("d", 1, "d_chunk_1", "gamma delta")).toDS()
    val out = graft.operators.GraphAssembly
      .extractAll(chunks, new JsonLlmExtractor(fake)).collect()
    assert(out.flatMap(_.nodes.map(_.id)).toSet == Set("alpha", "gamma"))
  }
}
