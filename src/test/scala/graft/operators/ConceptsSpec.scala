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
}
