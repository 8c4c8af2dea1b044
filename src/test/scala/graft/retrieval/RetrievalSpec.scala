package graft.retrieval

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks = Seq(
    ("d1", 0, "d1_chunk_0", "alpha beta gamma"),
    ("d1", 1, "d1_chunk_1", "beta delta"),
    ("d1", 2, "d1_chunk_2", "Gamma Epsilon beta"),
    ("d2", 0, "d2_chunk_0", "zeta eta"),
    ("d2", 1, "d2_chunk_1", "alpha alpha beta"))
    .toDF("doc_id", "idx", "chunk_id", "text")

  test("keywordSearch ANY counts keyword hits, ALL intersects") {
    val any = Retrieval.keywordSearch(chunks, Seq("alpha", "beta"), "ANY", 10)
      .select($"chunk_id", $"num_times_seen").as[(String, Long)].collect().toMap
    assert(any == Map("d1_chunk_0" -> 2L, "d1_chunk_1" -> 1L,
      "d1_chunk_2" -> 1L, "d2_chunk_1" -> 2L))
    val all = Retrieval.keywordSearch(chunks, Seq("alpha", "beta"), "ALL", 10)
      .select($"chunk_id").as[String].collect().toSet
    assert(all == Set("d1_chunk_0", "d2_chunk_1"))
    // case-insensitive + spaces -> wildcard (gsql: "%"+lower(replace(key," ","%"))+"%")
    val spaced = Retrieval.keywordSearch(chunks, Seq("gamma beta"), "ANY", 10)
      .select($"chunk_id").as[String].collect().toSet
    assert(spaced == Set("d1_chunk_2"))
  }

  test("keywordSearch top-k is deterministic on hit-count ties") {
    val topped = Retrieval.keywordSearch(chunks, Seq("beta"), "ANY", 2)
      .select($"chunk_id").as[String].collect().toSeq
    assert(topped == Seq("d1_chunk_0", "d1_chunk_1"))
  }

  test("siblingSearch returns the +-window with signed distances per seed") {
    val out = Retrieval.siblingSearch(chunks, Seq("d1_chunk_1"), 1, 1)
      .select($"chunk_id", $"distance").as[(String, Long)].collect().toMap
    assert(out == Map("d1_chunk_0" -> -1L, "d1_chunk_1" -> 0L, "d1_chunk_2" -> 1L))
  }

  test("hybridExpand counts arrivals and filters by num_seen_min") {
    val edges = Seq(("a", "P", "b"), ("a", "Q", "c"), ("b", "P", "c"), ("c", "P", "d"))
      .toDF("subj", "pred", "obj")
    val out = Retrieval.hybridExpand(edges, Seq("a"), numHops = 2)
      .select($"entity_id", $"num_times_seen").as[(String, Long)].collect().toMap
    // hop1 from {a}: b,c. hop2 from {b,c}: a(from b), c(from b), a(from c), b(from c), d(from c)
    assert(out("a") == 3L) // seed + reached twice at hop 2
    assert(out("d") == 1L)
    assert(out("b") == 2L && out("c") == 2L)
    val strict = Retrieval.hybridExpand(edges, Seq("a"), 2, numSeenMin = 2)
      .select($"entity_id").as[String].collect().toSet
    assert(strict == Set("a", "b", "c"))
  }

  test("entityRelationshipRetrieval: +2 direct, +1 via-document, rel LIKE seeds") {
    val entities = Seq("acme_corp", "acme_inc", "zeta").toDF("entity_id")
    val mentions = Seq(("c1", "acme_corp"), ("c1", "acme_inc"), ("c2", "zeta"))
      .toDF("chunk_id", "entity_id")
    // c1,c2,c3 in doc d1; c4 alone in d2
    val ch = Seq(("d1", 0, "c1", "t1"), ("d1", 1, "c2", "t2"), ("d1", 2, "c3", "t3"),
      ("d2", 0, "c4", "t4")).toDF("doc_id", "idx", "chunk_id", "text")
    val triples = Seq(("zeta", "WORKS_AT", "acme_corp", "c4"))
      .toDF("subj", "pred", "obj", "chunk_id")
    // entity seeds only: c1 direct (+2) and in touched doc (+1) = 3;
    // c2,c3 same doc = 1; c4 untouched doc, no entity seed mention = absent
    val out = Retrieval.entityRelationshipRetrieval(entities, mentions, ch, triples,
      Seq("%acme%"), Nil, 5)
      .select($"chunk_id", $"touch_count").as[(String, Long)].collect().toMap
    assert(out == Map("c1" -> 3L, "c2" -> 1L, "c3" -> 1L))
    // relationship seeds: %works% matches WORKS_AT whose provenance chunk is
    // c4 -> c4 = 2 (direct) + 1 (its doc) = 3; entity side unchanged
    val both = Retrieval.entityRelationshipRetrieval(entities, mentions, ch, triples,
      Seq("%acme%"), Seq("%works%"), 5)
      .select($"chunk_id", $"touch_count").as[(String, Long)].collect().toMap
    assert(both("c4") == 3L && both("c1") == 3L && both("c2") == 1L)
  }

  test("typedEdges + hybridExpandTyped: typed edge set changes the answer") {
    // planted: entity a --WORKS_AT--> b, chunk k1 mentions a, k1 IS_AFTER k0
    val triples = Seq(("a", "WORKS_AT", "b", "k1")).toDF("subj", "pred", "obj", "chunk_id")
    val mentions = Seq(("k1", "a")).toDF("chunk_id", "entity_id")
    val ch = Seq(("d", 0, "k0", "t0"), ("d", 1, "k1", "t1"))
      .toDF("doc_id", "idx", "chunk_id", "text")
    val edges = Retrieval.typedEdges(triples, mentions, ch)
    // pred-agnostic entity-pair walk can NEVER reach chunks; the typed walk
    // must: a ->(rev CONTAINS_ENTITY) k1 ->(IS_AFTER) k0 at hop 2, plus
    // a -> b (RELATIONSHIP) and a -> R:WORKS_AT (IS_HEAD_OF) at hop 1
    val out = Retrieval.hybridExpandTyped(edges, Seq("E:a"), numHops = 2)
      .select($"vertex_id", $"num_times_seen").as[(String, Long)].collect().toMap
    assert(out.keySet == Set("E:a", "E:b", "R:WORKS_AT", "C:k1", "C:k0"))
    // E:b reached twice at hop 2? b gets RELATIONSHIP arrival at hop1 and
    // HAS_TAIL arrival (from R:WORKS_AT) at hop2
    assert(out("E:b") == 2L)
    assert(out("C:k0") == 1L)
    // cycle guard: the k1 -> (rev CONTAINS_ENTITY is chunk->entity? no —
    // CONTAINS_ENTITY k1->a exists, but a is k1's ancestor, so the walk
    // never returns to a (num_times_seen stays the seed floor)
    assert(out("E:a") == 1L)
    // per-seed attribution: every row names the seed
    val seeds = Retrieval.hybridExpandTyped(edges, Seq("E:a"), 2)
      .select($"seed_id").distinct().as[String].collect().toSeq
    assert(seeds == Seq("E:a"))
  }

  test("hybridExpandTyped: visited guard stops re-expansion, numSeenMin filters") {
    // triangle a-b-c (symmetric RELATIONSHIP edges both ways)
    val triples = Seq(
      ("a", "P", "b", "k"), ("b", "P", "a", "k"),
      ("b", "P", "c", "k"), ("c", "P", "b", "k"),
      ("a", "P", "c", "k"), ("c", "P", "a", "k")).toDF("subj", "pred", "obj", "chunk_id")
    val mentions = Seq.empty[(String, String)].toDF("chunk_id", "entity_id")
    val ch = Seq.empty[(String, Int, String, String)].toDF("doc_id", "idx", "chunk_id", "text")
    val edges = Retrieval.typedEdges(triples, mentions, ch)
      .where($"etype" === "RELATIONSHIP")
    val out = Retrieval.hybridExpandTyped(edges, Seq("E:a"), numHops = 3, numSeenMin = 2)
      .select($"vertex_id", $"num_times_seen").as[(String, Long)].collect().toMap
    // hop1: b,c reached from a (1 each). hop2: b,c expand; b->c and c->b
    // allowed (not ancestors of each other) -> b,c reach 2; a is both's
    // ancestor -> never revisited; all vertices visited -> hop3 no-op
    assert(out == Map("E:a" -> 2L, "E:b" -> 2L, "E:c" -> 2L))
  }

  test("hybridContext assembles per-type context strings") {
    val triples = Seq(("a", "WORKS_AT", "b", "k1")).toDF("subj", "pred", "obj", "chunk_id")
    val mentions = Seq(("k1", "a")).toDF("chunk_id", "entity_id")
    val ch = Seq(("d", 0, "k0", "text zero"), ("d", 1, "k1", "text one"))
      .toDF("doc_id", "idx", "chunk_id", "text")
    val entities = Seq(
      ("a", Seq("desc a1", "desc a2"), "Person"), ("b", Seq("desc b"), "Org"))
      .toDF("entity_id", "descriptions", "entity_type")
    val edges = Retrieval.typedEdges(triples, mentions, ch)
    val expanded = Retrieval.hybridExpandTyped(edges, Seq("E:a"), numHops = 2)
    val ctx = Retrieval.hybridContext(expanded, entities, ch)
      .select($"vertex_id", $"context").as[(String, String)].collect().toMap
    assert(ctx("E:a") == "Entity: a, Description: desc a1; desc a2")
    assert(ctx("E:b") == "Entity: b, Description: desc b")
    assert(ctx("R:WORKS_AT") == "WORKS_AT")
    assert(ctx("C:k1") == "text one" && ctx("C:k0") == "text zero")
  }

  test("vector-seeded retrievers: vectorSeeds picks top-k, variants compose") {
    val chunkEmb = Seq(
      ("k1", Array(1f, 0f)), ("k2", Array(0.8f, 0.2f)), ("k3", Array(0f, 1f)))
      .toDF("chunk_id", "embedding")
    val seeds = Retrieval.vectorSeeds(chunkEmb, Array(1f, 0f), 2, "chunk_id")
      .select($"chunk_id").as[String].collect().toSeq
    assert(seeds == Seq("k1", "k2"))
    val ch = Seq(("d", 0, "k1", "t1"), ("d", 1, "k2", "t2"), ("d", 2, "k3", "t3"))
      .toDF("doc_id", "idx", "chunk_id", "text")
    val sib = Retrieval.siblingVectorSearch(ch, chunkEmb, Array(0f, 1f), 1, 1, 1)
      .select($"chunk_id").as[String].collect().toSet
    assert(sib == Set("k2", "k3"), "seeded at k3, window picks k2 and k3")
  }

  test("communitySearch descends the hierarchy and gathers member context") {
    val communities = Seq(("c1_1", 1, "desc c1"), ("c2_1", 1, "desc c2"),
      ("c1_1_2", 2, "top")).toDF("community_id", "iteration", "description")
    val hasParent = Seq(("c1_1", "c1_1_2"), ("c2_1", "c1_1_2"))
      .toDF("community_id", "parent_id")
    val inCommunity = Seq(("e1", "c1_1"), ("e2", "c2_1"))
      .toDF("canonical_id", "community_id")
    val resolvesTo = Seq(("e1a", "e1"), ("e1", "e1"), ("e2", "e2"))
      .toDF("entity_id", "canonical_id")
    val mentions = Seq(("k1", "e1a"), ("k2", "e2")).toDF("chunk_id", "entity_id")
    val ch = Seq(("k1", "text one"), ("k2", "text two")).toDF("chunk_id", "text")
    val out = Retrieval.communitySearch(communities, hasParent, inCommunity,
      resolvesTo, mentions, ch, Seq("c1_1_2"))
      .select($"chunk_id").as[String].collect().toSet
    assert(out == Set("k1", "k2"), "level-2 seed reaches both level-1 members' chunks")
    val lvl1 = Retrieval.communitySearch(communities, hasParent, inCommunity,
      resolvesTo, mentions, ch, Seq("c2_1"))
      .select($"chunk_id").as[String].collect().toSet
    assert(lvl1 == Set("k2"))
  }

  test("contentSimilaritySearch returns top-k by cosine") {
    val emb = Seq(
      ("a", Array(1f, 0f), "A"), ("b", Array(0.9f, 0.1f), "B"), ("c", Array(0f, 1f), "C"))
      .toDF("id", "embedding", "content")
    val out = Retrieval.contentSimilaritySearch(emb, Array(1f, 0f), 2)
      .select($"id").as[String].collect().toSeq
    assert(out == Seq("a", "b"))
  }

  test("contentFetch: id-seeded content by vertex type (non-vector Q2)") {
    val chunks = Seq(("k1", "chunk text"), ("k2", "other")).toDF("chunk_id", "text")
    val docs = Seq(("d1", "doc text")).toDF("doc_id", "text")
    val entities = Seq(("e1", Seq("z desc", "a desc")))
      .toDF("entity_id", "descriptions")
    val comms = Seq(("c1", "community desc")).toDF("community_id", "description")
    val out = Retrieval.contentFetch(
      Seq(("k1", "DocumentChunk"), ("d1", "Document"), ("e1", "Entity"),
        ("e1", "Concept"), ("c1", "Community"), ("missing", "Entity")),
      chunks, docs, entities, comms)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      ("k1", "DocumentChunk", "chunk text"),
      ("d1", "Document", "doc text"),
      ("e1", "Entity", "z desc; a desc"),
      ("e1", "Concept", "z desc; a desc"),
      ("c1", "Community", "community desc")))
  }

  test("bm25TopK matches the hand-computed Lucene-idf formula") {
    // N=3, avgdl=3; idf(apple)=ln(1+2.5/1.5), idf(cherry)=ln(1+1.5/2.5)
    val docs = Seq(
      ("d1", "apple banana apple"),
      ("d2", "banana cherry"),
      ("d3", "cherry cherry cherry durian")).toDF("doc_id", "text")
    val q = Seq(("q", "apple"), ("q", "cherry")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(docs, q, k = 3)
      .orderBy($"rank")
      .as[(String, Int, String, Double)].collect()
    assert(out.map(r => (r._2, r._3)).toSeq == Seq((1, "d1"), (2, "d3"), (3, "d2")))
    val lnApple = math.log(1 + 2.5 / 1.5)
    val lnCherry = math.log(1 + 1.5 / 2.5)
    val expect = Map(
      "d1" -> lnApple * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3)),
      "d2" -> lnCherry * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3)),
      "d3" -> lnCherry * (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * 4.0 / 3)))
    out.foreach(r => assert(math.abs(r._4 - expect(r._3)) < 1e-9,
      s"${r._3}: got ${r._4}, want ${expect(r._3)}"))
  }

  test("rrfFuse sums 1/(c+rank) across lists, ranks by fused score then id") {
    val rankings = Seq(
      ("q", "d1", 1), ("q", "d2", 2),   // lexical list
      ("q", "d2", 1), ("q", "d3", 2))   // vector list
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(rankings, k = 10).orderBy($"rank")
      .as[(String, Int, String, Double)].collect()
    assert(out.map(r => (r._2, r._3)).toSeq == Seq((1, "d2"), (2, "d1"), (3, "d3")))
    val expect = Map("d2" -> (1.0 / 61 + 1.0 / 62), "d1" -> 1.0 / 61, "d3" -> 1.0 / 62)
    out.foreach(r => assert(math.abs(r._4 - expect(r._3)) < 1e-12))
  }

  test("bm25TopK ranking is partition-count invariant (salted two-phase top-k)") {
    val docs = (1 to 300).map { i =>
      val words = (0 until (i % 17) + 2).map(j => s"w${(i * 7 + j * 3) % 23}")
      (s"d$i", words.mkString(" "))
    }.toDF("doc_id", "text")
    val q = Seq(("qa", "w1"), ("qa", "w5"), ("qb", "w10")).toDF("query_id", "term")
    def run(parts: Int) = Retrieval.bm25TopK(docs.repartition(parts), q, k = 10)
      .select($"query_id", $"rank", $"doc_id")
      .as[(String, Int, String)].collect().toSet
    assert(run(1) == run(13))
    assert(run(1).nonEmpty)
  }
}
