package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class ExtractorSpec extends AnyFunSuite {
  private val ex = new RuleExtractor

  test("fact sentence → relationship with normalized predicate") {
    val d = ex.extract("c1", "Mira Kovan works at Talor Corporation.")
    assert(d.nodes.isEmpty)
    assert(d.rels.size == 1)
    val r = d.rels.head
    assert(r.source == "Mira Kovan")
    assert(r.target == "Talor Corporation")
    assert(r.relation_type == "WORKS_AT")
  }

  test("multi-word verb is not eaten by the definition pattern") {
    val d = ex.extract("c1", "Kovan is located in Baduville.")
    assert(d.rels.size == 1)
    assert(d.rels.head.relation_type == "IS_LOCATED_IN")
  }

  test("definition sentence → node with description") {
    val d = ex.extract("c1", "Mira Kovan is belu daka fomi.")
    assert(d.rels.isEmpty)
    assert(d.nodes.size == 1)
    assert(d.nodes.head.id == "Mira Kovan")
    assert(d.nodes.head.description == "belu daka fomi")
  }

  test("definition with article keeps it in the description") {
    val d = ex.extract("c1", "X is a belu daka.")
    assert(d.nodes.head.description == "a belu daka")
    // word starting with 'a' is not mistaken for an article
    val d2 = ex.extract("c1", "X is abelu daka.")
    assert(d2.nodes.head.description == "abelu daka")
  }

  test("parse failure yields empty doc (reference drop semantics)") {
    val d = ex.extract("c1", "Mira Kovan zorbles Talor Corporation.")
    assert(d.nodes.isEmpty && d.rels.isEmpty)
    val d2 = ex.extract("c1", "no structure here")
    assert(d2.nodes.isEmpty && d2.rels.isEmpty)
  }

  test("category is stable per description") {
    val a = ex.extract("c1", "A is belu daka fomi.").nodes.head.node_type
    val b = ex.extract("c2", "B is belu daka fomi zzz.").nodes.head.node_type
    assert(a == b) // same first desc word → same type
  }
}
