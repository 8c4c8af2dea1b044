package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CatalogMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(Files.createTempDirectory("graft-merge").toString, spark)

  test("merge inserts new PKs, updates existing, set-unions array columns") {
    val cat = freshCatalog()
    val base = Seq(
      ("e1", Seq("desc a"), "Person"),
      ("e2", Seq("desc b"), "Place"))
      .toDF("entity_id", "descriptions", "entity_type")
    cat.merge("entities", base, Seq("entity_id"), Seq("descriptions"))
    assert(cat.read("entities").count() == 2)

    val updates = Seq(
      ("e2", Seq("desc b2"), "Place"),       // existing: union descriptions
      ("e3", Seq("desc c"), "Organization")) // new PK: insert
      .toDF("entity_id", "descriptions", "entity_type")
    cat.merge("entities", updates, Seq("entity_id"), Seq("descriptions"))

    val rows = cat.read("entities")
      .as[(String, Seq[String], String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("e1", "e2", "e3"))
    assert(rows(0)._2 == Seq("desc a"), "untouched row survives")
    assert(rows(1)._2 == Seq("desc b", "desc b2"), "SET-union of descriptions")
    assert(rows(2)._2 == Seq("desc c"))
  }

  test("merge is idempotent: re-merging the same batch changes nothing") {
    val cat = freshCatalog()
    val batch = Seq(("e1", Seq("x"), "T")).toDF("entity_id", "descriptions", "entity_type")
    cat.merge("t", batch, Seq("entity_id"), Seq("descriptions"))
    val before = cat.read("t").as[(String, Seq[String], String)].collect().toSeq
    cat.merge("t", batch, Seq("entity_id"), Seq("descriptions"))
    val after = cat.read("t").as[(String, Seq[String], String)].collect().toSeq
    assert(before == after)
  }

  test("merge scalar columns take the update's value (last-write-wins)") {
    val cat = freshCatalog()
    cat.merge("t", Seq(("k1", 1L)).toDF("id", "v"), Seq("id"))
    cat.merge("t", Seq(("k1", 2L), ("k2", 7L)).toDF("id", "v"), Seq("id"))
    val m = cat.read("t").as[(String, Long)].collect().toMap
    assert(m == Map("k1" -> 2L, "k2" -> 7L))
  }
}
