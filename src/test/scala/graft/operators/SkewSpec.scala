package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = (
    (1 to 500).map(i => ("hot", s"desc${i % 7}", s"chunk$i")) ++
      Seq(("cold", "only", "chunkX")))
    .toDF("key", "value", "prov")

  test("saltedCollectSet == plain collect_set semantics") {
    val salted = Skew.saltedCollectSet(rows, Seq("key"), "value", "prov", nSalts = 8)
      .as[(String, Seq[String])].collect().toMap
    val plain = rows.groupBy($"key")
      .agg(sort_array(collect_set($"value")).as("values"))
      .as[(String, Seq[String])].collect().toMap
    assert(salted == plain)
    assert(salted("hot") == (0 until 7).map(i => s"desc$i"))
  }

  test("saltedCount == plain count") {
    val salted = Skew.saltedCount(rows, Seq("key"), "prov", nSalts = 8)
      .as[(String, Long)].collect().toMap
    assert(salted == Map("hot" -> 500L, "cold" -> 1L))
  }

  test("saltedDistinct == distinct on the key tuple") {
    val out = Skew.saltedDistinct(rows.select($"key", $"value", $"prov"),
      Seq("key", "value"), "prov", nSalts = 8)
    assert(out.count() == 8) // 7 hot values + 1 cold
    assert(out.columns.toSeq == Seq("key", "value", "prov"))
  }

  test("salt distributes a hot key over multiple groups in phase 1") {
    val salts = rows.where($"key" === "hot")
      .select(Skew.saltCol($"prov", 8)).distinct().count()
    assert(salts >= 6, s"expected the hot key spread over most salts, got $salts")
  }
}
