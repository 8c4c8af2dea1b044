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

  test("entityRelationshipRetrieval scores chunks by seed-entity touches") {
    val entities = Seq("acme_corp", "acme_inc", "zeta").toDF("entity_id")
    val mentions = Seq(
      ("c1", "acme_corp"), ("c1", "acme_inc"), ("c2", "acme_corp"), ("c2", "zeta"))
      .toDF("chunk_id", "entity_id")
    val ch = Seq(("c1", "t1"), ("c2", "t2")).toDF("chunk_id", "text")
    val out = Retrieval.entityRelationshipRetrieval(entities, mentions, ch, "%acme%", 5)
      .select($"chunk_id", $"touch_count").as[(String, Long)].collect().toMap
    assert(out == Map("c1" -> 2L, "c2" -> 1L))
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
}
