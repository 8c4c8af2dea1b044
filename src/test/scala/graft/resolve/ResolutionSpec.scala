package graft.resolve

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.extract.HashEmbedder
import graft.model.Entity

/** Route-parity invariants of entity resolution: the broadcast-map and
  * shuffle-join candidate-scoring paths must emit IDENTICAL rows (bit-equal
  * cosines — the auto-routing bound must never change results), and the
  * driver-local union-find finish must agree with the distributed min-label
  * loop. PipelineSpec covers the end-to-end P/R gates; this spec pins the
  * internal path equivalences those gates rely on.
  */
class ResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def embFrame(texts: (String, String)*): DataFrame = {
    val e = new HashEmbedder(1536, 42)
    texts.map { case (id, t) => (id, e.embed(t)) }.toDF("entity_id", "embedding")
  }

  private val base = "one two three four five six seven eight nine ten eleven twelve"

  test("broadcast and shuffle-join scoring paths emit identical rows") {
    val emb = embFrame(
      "a1" -> s"$base alpha", "a2" -> s"$base beta", "a3" -> s"$base gamma",
      "b1" -> "completely different tokens sharing nothing with the cluster",
      "b2" -> "another unrelated bag of words far away in embedding space")
    val viaBroadcast = Resolution
      .candidatePairs(emb, Resolution.Params())
      .as[(String, String, Double)].collect().toSet
    val viaShuffle = Resolution
      .candidatePairs(emb, Resolution.Params(maxBroadcastBytes = 0L))
      .as[(String, String, Double)].collect().toSet
    assert(viaBroadcast.nonEmpty, "alias cluster must produce candidate pairs")
    assert(viaBroadcast == viaShuffle,
      s"paths diverged:\n  broadcast=$viaBroadcast\n  shuffle=$viaShuffle")
    // the ≥ 0.90 threshold held on every emitted pair
    assert(viaBroadcast.forall(_._3 >= 0.90 - 1e-6))
    // no cross-cluster pair leaked
    assert(viaBroadcast.forall { case (s, d, _) => s.startsWith("a") && d.startsWith("a") })
  }

  test("connectedComponents: local finish and distributed loop agree") {
    val ids = Seq("n0", "n1", "n2", "n3", "n4", "n5", "n6", "n7", "iso")
      .toDF("entity_id")
    val pairs = Seq(("n0", "n1"), ("n1", "n2"), ("n3", "n4"),
      ("n5", "n6"), ("n6", "n7"), ("n7", "n5")).toDF("src", "dst")
    val local = Resolution.connectedComponents(ids, pairs)
      .as[(String, String)].collect().toMap
    val distributed = Resolution.connectedComponents(ids, pairs, localFinishEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(local == distributed)
    assert(local("n0") == "n0" && local("n2") == "n0")
    assert(local("n5") == "n5" && local("n7") == "n5")
    assert(local("iso") == "iso", "isolated ids resolve to themselves")
  }

  test("resolvesTo canonical pick: longest id, ties to the larger id") {
    val ents = Seq(
      Entity("ab", Seq("x"), ""), Entity("abc", Seq("x"), ""),
      Entity("abd", Seq("x"), ""), Entity("zz", Seq("y"), "")).toDS()
    val pairs = Seq(("ab", "abc", 0.95), ("abc", "abd", 0.95)).toDF("src", "dst", "cos")
    val out = Resolution.resolvesTo(ents, pairs).collect()
      .map(r => r.entity_id -> r.canonical_id).toMap
    assert(out("ab") == "abd" && out("abc") == "abd" && out("abd") == "abd",
      "longest id wins; length tie broken by lexicographically larger id")
    assert(out("zz") == "zz", "unpaired entity self-resolves")
  }

  test("signatures are stable across partitionings (sparse signing)") {
    val emb = embFrame((0 until 40).map(i => s"e$i" -> s"$base token$i"): _*)
    val p = Resolution.Params()
    val a = Resolution.debugSigs(emb, p)
      .as[(String, Int, Int)].collect().toSet
    val b = Resolution.debugSigs(emb.repartition(7), p)
      .as[(String, Int, Int)].collect().toSet
    assert(a == b)
    assert(a.size == 40 * p.bands)
  }
}
