package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Triple

class ConceptsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def triples = Seq(
    Triple("a", "WORKS_AT", "x", "c1"),
    Triple("b", "WORKS_AT", "x", "c1"),
    Triple("a", "FOUNDED", "y", "c2"),
    Triple("a", "WORKS_AT", "x", "c3") // duplicate edge, different chunk
  ).toDS()

  test("reify dedups by (subj,pred,obj) and builds head/tail edges") {
    val (rels, heads, tails) = Concepts.reify(triples)
    assert(rels.count() == 3)
    assert(heads.count() == 3 && tails.count() == 3)
    val h = heads.as[(String, String)].collect().toSet
    assert(h.contains(("a", "a__WORKS_AT__x")))
    assert(h.contains(("b", "b__WORKS_AT__x")))
  }

  test("buildEntityConcepts derives head/tail entity concepts per relationship concept") {
    val (rels, heads, tails) = Concepts.reify(triples)
    val seed = Concepts.conceptsPerRelationType(rels)
    val (concepts, describes) = Concepts.buildEntityConcepts(seed, heads, tails)
    val cids = concepts.select("concept_id").as[String].collect().toSet
    assert(cids == Set(
      "EntitiesAreHeadOfrel_type_works_at", "EntitiesAreTailOfrel_type_works_at",
      "EntitiesAreHeadOfrel_type_founded", "EntitiesAreTailOfrel_type_founded"))
    val d = describes.as[(String, String)].collect().toSet
    assert(d(("EntitiesAreHeadOfrel_type_works_at", "a")))
    assert(d(("EntitiesAreHeadOfrel_type_works_at", "b")))
    assert(d(("EntitiesAreTailOfrel_type_works_at", "x")))
    assert(d(("EntitiesAreTailOfrel_type_founded", "y")))
    assert(!d.exists { case (c, e) => c.endsWith("founded") && e == "b" })
  }

  test("buildCommunityConcepts keeps size-bounded components as concepts") {
    val nodes = Seq("a", "b", "c", "d", "e", "solo").toDF("entity_id")
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("src", "dst")
    val (concepts, members) =
      Concepts.buildCommunityConcepts(nodes, edges, minSize = 2, maxSize = 2)
    // {a,b,c} size 3 excluded; {d,e} size 2 kept; {solo} size 1 excluded
    assert(concepts.select("concept_id").as[String].collect().toSeq == Seq("InCommunityd"))
    assert(members.as[(String, String)].collect().toSet ==
      Set(("InCommunityd", "d"), ("InCommunityd", "e")))
  }

  // -------------------------------------------------- concept tree (r4)

  private def cover(rows: (String, String)*) = rows.toDF("concept_id", "member_id")

  test("conceptCover: AND intersects child covers, OR unions, bottom-up through levels") {
    // tree: and1 = AND(l1, l2); or1 = OR(l2, l3); top = AND(and1, or1)
    val concepts = Seq(
      ("l1", "ENTITY_LEAF"), ("l2", "ENTITY_LEAF"), ("l3", "ENTITY_LEAF"),
      ("and1", "AND"), ("or1", "OR"), ("top", "AND")).toDF("concept_id", "concept_type")
    val tree = Seq(
      ("l1", "and1"), ("l2", "and1"),
      ("l2", "or1"), ("l3", "or1"),
      ("and1", "top"), ("or1", "top")).toDF("child_id", "parent_id")
    val leaves = cover(
      ("l1", "a"), ("l1", "b"), ("l1", "c"),
      ("l2", "b"), ("l2", "c"), ("l2", "d"),
      ("l3", "c"), ("l3", "e"))
    val out = Concepts.conceptCover(concepts, tree, leaves)
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out("and1") == Set("b", "c"))           // {a,b,c} ∩ {b,c,d}
    assert(out("or1") == Set("b", "c", "d", "e"))  // {b,c,d} ∪ {c,e}
    assert(out("top") == Set("b", "c"))            // {b,c} ∩ {b,c,d,e}
  }

  test("conceptCover: an empty-cover leaf still unblocks its AND parent (empty intersect)") {
    val concepts = Seq(("l1", "ENTITY_LEAF"), ("lEmpty", "ENTITY_LEAF"), ("p", "AND"))
      .toDF("concept_id", "concept_type")
    val tree = Seq(("l1", "p"), ("lEmpty", "p")).toDF("child_id", "parent_id")
    val out = Concepts.conceptCover(concepts, tree, cover(("l1", "a")))
      .as[(String, String)].collect()
    assert(!out.exists(_._1 == "p")) // p resolves to the empty set, no deadlock
    assert(out.toSet == Set(("l1", "a")))
  }

  test("conceptCooccurrence counts |cover∩cover| for same-type ROOT pairs only") {
    val concepts = Seq(
      ("c1", "ENTITY_LEAF"), ("c2", "ENTITY_LEAF"), ("c3", "ENTITY_LEAF"),
      ("other", "REL_LEAF"), ("childC", "ENTITY_LEAF"), ("pC", "AND"))
      .toDF("concept_id", "concept_type")
    // childC is under pC, so childC is NOT a root and must not pair
    val tree = Seq(("childC", "pC")).toDF("child_id", "parent_id")
    val cov = cover(
      ("c1", "a"), ("c1", "b"), ("c1", "c"),
      ("c2", "b"), ("c2", "c"), ("c2", "d"),
      ("c3", "z"),
      ("other", "a"), ("other", "b"), // same members, different type: no pair
      ("childC", "a"), ("childC", "b"))
    val got = Concepts.conceptCooccurrence(concepts, tree, cov)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(("c1", "c2", "ENTITY_LEAF", 2L))) // {b,c}; c3 disjoint; childC non-root
  }

  test("buildConceptTree merges >=min pairs under <a>_AND_<b> parents (reference id order)") {
    val concepts = Seq(("beta", "E"), ("alpha", "E"), ("gamma", "E"))
      .toDF("concept_id", "concept_type")
    val tree = Seq.empty[(String, String)].toDF("child_id", "parent_id")
    val cov = cover(
      ("alpha", "m1"), ("alpha", "m2"), ("alpha", "m3"),
      ("beta", "m1"), ("beta", "m2"), ("beta", "m4"),
      ("gamma", "m1")) // gamma co-occurs once with each — below threshold 2
    val (newConcepts, newEdges) = Concepts.buildConceptTree(concepts, tree, cov,
      minCooccurrence = 2)
    assert(newConcepts.as[(String, String)].collect().toSet ==
      Set(("alpha_AND_beta", "AND"))) // min id first, like `IF c.id <= conc`
    assert(newEdges.as[(String, String)].collect().toSet ==
      Set(("alpha", "alpha_AND_beta"), ("beta", "alpha_AND_beta")))
    // the grown tree feeds back: the new parent's cover is the intersection
    val all = concepts.unionByName(newConcepts)
    val allEdges = tree.unionByName(newEdges)
    val full = Concepts.conceptCover(all, allEdges, cov)
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(full("alpha_AND_beta") == Set("m1", "m2"))
  }
}
