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

  test("merge keeps columns absent from the updates frame (schema reconcile)") {
    val cat = freshCatalog()
    cat.merge("t", Seq(("k1", 1L, "keep-me")).toDF("id", "v", "extra"), Seq("id"))
    // updates lack `extra`: old values must survive, not be dropped
    cat.merge("t", Seq(("k1", 2L), ("k2", 7L)).toDF("id", "v"), Seq("id"))
    val rows = cat.read("t").select("id", "v", "extra")
      .as[(String, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows("k1") == ((2L, Some("keep-me"))))
    assert(rows("k2") == ((7L, None)))
  }

  test("merge rejects duplicate PKs in the updates frame") {
    val cat = freshCatalog()
    cat.merge("t", Seq(("k1", 1L)).toDF("id", "v"), Seq("id"))
    val dup = Seq(("k2", 2L), ("k2", 3L)).toDF("id", "v")
    assertThrows[IllegalArgumentException](cat.merge("t", dup, Seq("id")))
  }

  test("merge supports per-column custom merge expressions") {
    import org.apache.spark.sql.functions.least
    val cat = freshCatalog()
    cat.merge("t", Seq(("k1", "m")).toDF("id", "ty"), Seq("id"))
    cat.merge("t", Seq(("k1", "b"), ("k2", "z")).toDF("id", "ty"), Seq("id"),
      mergeExprs = Map("ty" -> ((o, n) => least(o, n))))
    val m = cat.read("t").as[(String, String)].collect().toMap
    assert(m == Map("k1" -> "b", "k2" -> "z"))
  }

  private def bucketFiles(cat: Catalog, table: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(cat.path(table)))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  test("mergeBucketed rewrites only touched buckets; untouched files are byte-identical") {
    val cat = freshCatalog()
    val nBuckets = 8
    val base = (0 until 200).map(i => (s"k$i", i.toLong)).toDF("id", "v")
    cat.mergeBucketed("t", base, Seq("id"), nBuckets = nBuckets)
    val before = bucketFiles(cat, "t")
    assert(before.keySet.exists(_.contains("_bucket=")), "layout is partitioned by bucket")

    // one-key delta: exactly one bucket dir may change
    cat.mergeBucketed("t", Seq(("k7", 999L)).toDF("id", "v"), Seq("id"), nBuckets = nBuckets)
    val after = bucketFiles(cat, "t")
    def bucketOf(p: String) = p.split("_bucket=")(1).split("/")(0)
    val changed = (before.keySet ++ after.keySet)
      .filter(p => before.get(p) != after.get(p)).map(bucketOf)
    assert(changed.size == 1, s"exactly one bucket rewritten, got $changed")
    // untouched buckets: same paths, sizes AND mtimes (files never rewritten)
    val untouched = before.filter { case (p, _) => !changed.contains(bucketOf(p)) }
    untouched.foreach { case (p, sig) => assert(after(p) == sig, s"$p was rewritten") }

    // logical result is the full merge
    val m = cat.read("t").as[(String, Long)].collect().toMap
    assert(m.size == 200 && m("k7") == 999L && m("k6") == 6L)
  }

  test("mergeBucketed set-union + row count across incremental batches") {
    val cat = freshCatalog()
    val b1 = Seq(("e1", Seq("a")), ("e2", Seq("b"))).toDF("id", "descs")
    val b2 = Seq(("e2", Seq("b2")), ("e3", Seq("c"))).toDF("id", "descs")
    cat.mergeBucketed("t", b1, Seq("id"), setUnionCols = Seq("descs"), nBuckets = 4)
    cat.mergeBucketed("t", b2, Seq("id"), setUnionCols = Seq("descs"), nBuckets = 4)
    val m = cat.read("t").as[(String, Seq[String])].collect().toMap
    assert(m == Map("e1" -> Seq("a"), "e2" -> Seq("b", "b2"), "e3" -> Seq("c")))
  }

  test("recover rolls forward a crash between the swap renames, and rolls back a lost staging") {
    import org.apache.hadoop.fs.Path
    val cat = freshCatalog()
    val fs = new Path(cat.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(("e1", 1)).toDF("id", "v").write.parquet(cat.path("t"))

    // crash window: live moved aside, COMPLETE staging not yet promoted
    Seq(("e1", 2)).toDF("id", "v").write.parquet(cat.path("t._staging"))
    assert(fs.rename(new Path(cat.path("t")), new Path(cat.path("t._old"))))
    assert(!cat.exists("t"))
    // read() recovers by rolling FORWARD to the staged (new) table
    assert(cat.read("t").as[(String, Int)].collect().toSeq == Seq(("e1", 2)))
    assert(!fs.exists(new Path(cat.path("t._old"))))
    assert(!fs.exists(new Path(cat.path("t._staging"))))

    // crash window: live moved aside, staging incomplete/absent -> roll BACK
    assert(fs.rename(new Path(cat.path("t")), new Path(cat.path("t._old"))))
    fs.mkdirs(new Path(cat.path("t._staging"))) // torn write: no _SUCCESS
    assert(cat.recover("t"))
    assert(cat.read("t").as[(String, Int)].collect().toSeq == Seq(("e1", 2)))
    assert(!fs.exists(new Path(cat.path("t._staging"))))

    // healthy table: recover is a no-op that only clears a leftover aside
    fs.mkdirs(new Path(cat.path("t._old")))
    assert(!cat.recover("t"))
    assert(!fs.exists(new Path(cat.path("t._old"))))
  }
}
