package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PK point-lookup over the bucketed catalog layout: correctness, actual
  * bucket pruning (inputFiles inspection), and the layout-marker guarantees
  * that make O(delta) merges safe against caller nBuckets drift.
  */
class CatalogLookupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(Files.createTempDirectory("graft-lookup").toString, spark)

  private val n = 500
  private def rows = (0 until n).map(i => (s"doc$i", s"text of $i", i.toLong))

  test("lookup returns exactly the requested keys' rows") {
    val cat = freshCatalog()
    cat.writeBucketed("docs", rows.toDF("doc_id", "text", "v"), Seq("doc_id"), 16)
    val keys = Seq("doc3", "doc57", "doc101", "missing").toDF("doc_id")
    val got = cat.lookup("docs", keys).as[(String, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("doc101", "doc3", "doc57"))
    assert(got.map(_._2).toSeq == Seq("text of 101", "text of 3", "text of 57"))
  }

  test("lookup reads only the buckets its keys hash into") {
    val cat = freshCatalog()
    cat.writeBucketed("docs", rows.toDF("doc_id", "text", "v"), Seq("doc_id"), 16)
    val res = cat.lookup("docs", Seq("doc3", "doc57").toDF("doc_id"))
    val touched = res.inputFiles.map(f =>
      f.split("/").find(_.startsWith("_bucket=")).get).distinct
    assert(touched.length <= 2, s"2 keys must touch <= 2 bucket dirs, got ${touched.toSeq}")
    val all = cat.read("docs").inputFiles.map(f =>
      f.split("/").find(_.startsWith("_bucket=")).get).distinct
    assert(all.length > touched.length, "pruned scan must read fewer buckets than the table has")
  }

  test("lookup on a multi-column key uses literal predicates") {
    val cat = freshCatalog()
    val df = (0 until 100).map(i => (s"e${i % 10}", s"t${i / 10}", i)).toDF("a", "b", "v")
    cat.writeBucketed("pairs", df, Seq("a", "b"), 8)
    val got = cat.lookup("pairs", Seq(("e3", "t4"), ("e7", "t0")).toDF("a", "b"))
      .as[(String, String, Int)].collect().sortBy(_._3)
    assert(got.toSeq == Seq(("e7", "t0", 7), ("e3", "t4", 43)))
  }

  test("lookup falls back to a semi-join above the literal-key bound") {
    val cat = freshCatalog()
    cat.writeBucketed("docs", rows.toDF("doc_id", "text", "v"), Seq("doc_id"), 16)
    val keys = (0 until 50).map(i => s"doc$i").toDF("doc_id")
    val got = cat.lookup("docs", keys, maxLiteralKeys = 10).as[(String, String, Long)].collect()
    assert(got.length == 50)
    assert(got.map(_._3).sorted.toSeq == (0L until 50L))
  }

  test("multi-row-per-key tables return every row of each key") {
    val cat = freshCatalog()
    val df = Seq(("s1", "a"), ("s1", "b"), ("s2", "c"), ("s3", "d")).toDF("src", "dst")
    cat.writeKeyedCounted("pairs", df, Seq("src"), 8)
    val got = cat.lookup("pairs", Seq("s1").toDF("src")).as[(String, String)].collect()
    assert(got.map(_._2).sorted.toSeq == Seq("a", "b"))
  }

  test("mergeBucketed follows the recorded layout even when the caller's nBuckets drifts") {
    val cat = freshCatalog()
    cat.writeBucketed("t", Seq(("k1", 1L), ("k2", 2L)).toDF("id", "v"), Seq("id"), 16)
    // caller passes the DEFAULT 64 — pre-marker this re-bucketed the update
    // under a different hash mod and duplicated k1 across two dirs
    cat.mergeBucketed("t", Seq(("k1", 10L), ("k9", 9L)).toDF("id", "v"), Seq("id"))
    val m = cat.read("t").as[(String, Long)].collect().toMap
    assert(m == Map("k1" -> 10L, "k2" -> 2L, "k9" -> 9L))
    assert(cat.read("t").count() == 3, "no PK may be duplicated across buckets")
    assert(cat.bucketLayout("t").contains((Seq("id"), 16)))
  }

  test("merging by different key columns than the recorded layout is rejected") {
    val cat = freshCatalog()
    cat.writeBucketed("t", Seq(("k1", 1L)).toDF("id", "v"), Seq("id"), 8)
    val e = intercept[IllegalArgumentException] {
      cat.mergeBucketed("t", Seq(("k1", 2L)).toDF("id", "v"), Seq("v"))
    }
    assert(e.getMessage.contains("bucketed by"))
  }

  test("lookup after an O(delta) merge sees the merged values") {
    val cat = freshCatalog()
    cat.writeBucketed("t", rows.toDF("doc_id", "text", "v"), Seq("doc_id"), 16)
    cat.mergeBucketed("t", Seq(("doc3", "patched", 999L)).toDF("doc_id", "text", "v"), Seq("doc_id"))
    val got = cat.lookup("t", Seq("doc3", "doc4").toDF("doc_id"))
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("doc3", "patched", 999L), ("doc4", "text of 4", 4L)))
  }

  test("lookup with no matching buckets returns an empty frame with the table schema") {
    val cat = freshCatalog()
    // 2 buckets, keys present only in bucket dirs that exist; an unwritten
    // bucket dir must not break the path-selected read
    cat.writeBucketed("t", Seq(("a", 1)).toDF("id", "v"), Seq("id"), 4096)
    val got = cat.lookup("t", Seq("zzz-not-there").toDF("id"))
    assert(got.columns.toSeq == Seq("id", "v"))
    assert(got.count() == 0)
  }

  test("lookup on a flat table is rejected with a clear error") {
    val cat = freshCatalog()
    cat.write("flat", Seq(("a", 1)).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      cat.lookup("flat", Seq("a").toDF("id"))
    }
    assert(e.getMessage.contains("no recorded bucket layout"))
  }
}
