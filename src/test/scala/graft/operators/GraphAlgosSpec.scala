package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Graph analytics (GraphAlgos): PageRank fixed points + bit-determinism
  * across partitionings (the property the pinned oracle gates rely on),
  * BFS distances, degree stats.
  */
class GraphAlgosSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edges(rows: (String, String)*) = rows.toDF("src", "dst")

  test("pageRank: symmetric 2-cycle sits at the exact 0.5 fixed point") {
    val ranks = GraphAlgos.pageRank(edges("a" -> "b", "b" -> "a"), iterations = 10)
      .as[(String, java.math.BigDecimal)].collect().toMap
    assert(ranks("a").doubleValue() == 0.5 && ranks("b").doubleValue() == 0.5)
  }

  test("pageRank: 3-cycle sits at the exact 1/3 fixed point") {
    val third = new java.math.BigDecimal("0.333333333333333333")
    val ranks = GraphAlgos.pageRank(
        edges("a" -> "b", "b" -> "c", "c" -> "a"), iterations = 10)
      .as[(String, java.math.BigDecimal)].collect().toMap
    ranks.values.foreach(r => assert(r.compareTo(third) == 0, s"got $r"))
  }

  test("pageRank: hub dominates, mass is conserved up to dangling loss") {
    // star: every leaf points at the hub and the hub back at every leaf
    // (no dangling; bidirectional so the rank oscillation damps toward the
    // h ≈ 0.468 fixed point with hub > leaves at every iteration)
    val e = ((1 to 9).map(i => s"leaf$i" -> "hub") ++
      (1 to 9).map(i => "hub" -> s"leaf$i")).toDF("src", "dst")
    val ranks = GraphAlgos.pageRank(e, iterations = 10)
      .as[(String, java.math.BigDecimal)].collect().toMap
    val hub = ranks("hub").doubleValue()
    assert(ranks.keySet.size == 10)
    assert(ranks.forall { case (k, v) => k == "hub" || v.doubleValue() < hub })
    val total = ranks.values.map(_.doubleValue()).sum
    assert(total > 0.99 && total < 1.000001, s"sum=$total")
  }

  test("pageRank is bit-identical across partitionings") {
    val e = (0 until 150).flatMap { i =>
      Seq((s"n$i", s"n${(i * 7 + 1) % 150}"), (s"n$i", s"n${(i * 13 + 3) % 150}"))
    }.toDF("src", "dst")
    val a = GraphAlgos.pageRank(e, iterations = 8)
      .as[(String, java.math.BigDecimal)].collect().toMap
    val b = GraphAlgos.pageRank(e.repartition(17), iterations = 8)
      .as[(String, java.math.BigDecimal)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v.compareTo(b(k)) == 0, s"node $k: $v vs ${b(k)}") }
  }

  test("personalizedPageRank: mass decays from the seed; unreachable nodes get 0") {
    // path a→b→c plus an isolated edge x→y unreachable from the seed
    val ranks = GraphAlgos.personalizedPageRank(
        edges("a" -> "b", "b" -> "c", "x" -> "y"),
        Seq("a").toDF("id"), iterations = 10)
      .as[(String, java.math.BigDecimal)].collect().toMap
    val (a, b, c) = (ranks("a").doubleValue(), ranks("b").doubleValue(), ranks("c").doubleValue())
    assert(a > b && b > c && c > 0, s"proximity order broken: $a $b $c")
    assert(ranks("x").doubleValue() == 0.0 && ranks("y").doubleValue() == 0.0,
      "teleport mass must never reach nodes unreachable from the seeds")
    // only the seed receives teleport: a = 0.15 exactly (b,c contribute nothing back)
    assert(ranks("a").compareTo(new java.math.BigDecimal("0.15").setScale(18)) == 0)
  }

  test("personalizedPageRank with seeds = all nodes equals uniform pageRank bit-for-bit") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "c" -> "b")
    val all = Seq("a", "b", "c").toDF("id")
    val ppr = GraphAlgos.personalizedPageRank(e, all, iterations = 8)
      .as[(String, java.math.BigDecimal)].collect().toMap
    val pr = GraphAlgos.pageRank(e, iterations = 8)
      .as[(String, java.math.BigDecimal)].collect().toMap
    pr.foreach { case (k, v) => assert(ppr(k).compareTo(v) == 0, s"$k: ${ppr(k)} != $v") }
  }

  test("bfsDistances: hop counts on a path, maxHops bound respected") {
    val e = edges("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val seeds = Seq("a").toDF("id")
    val d3 = GraphAlgos.bfsDistances(e, seeds, maxHops = 3)
      .as[(String, Long)].collect().toMap
    assert(d3 == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    val d9 = GraphAlgos.bfsDistances(e, seeds, maxHops = 9)
      .as[(String, Long)].collect().toMap
    assert(d9("e") == 4L, "early-exit still reaches the path end")
  }

  test("bfsDistances: multi-source takes the nearest seed") {
    val e = edges("a" -> "b", "b" -> "c", "z" -> "c")
    val d = GraphAlgos.bfsDistances(e, Seq("a", "z").toDF("id"), maxHops = 5)
      .as[(String, Long)].collect().toMap
    assert(d == Map("a" -> 0L, "z" -> 0L, "b" -> 1L, "c" -> 1L))
  }

  test("labelPropagation: two bridged cliques split; labels deterministic across partitionings") {
    val clique = (ns: Seq[String]) => for { a <- ns; b <- ns if a < b } yield (a, b)
    val e = (clique(Seq("a", "b", "c", "d")) ++ clique(Seq("e", "f", "g", "h")) :+
      ("d" -> "e")).toDF("src", "dst")
    val labels = GraphAlgos.labelPropagation(e).as[(String, String)].collect().toMap
    assert(labels.size == 8)
    // each clique interior is uniform, and the two cliques differ
    assert(Set(labels("a"), labels("b"), labels("c")).size == 1)
    assert(Set(labels("f"), labels("g"), labels("h")).size == 1)
    assert(labels("a") != labels("f"), "bridged cliques must not merge")
    // deterministic under a different partitioning
    val again = GraphAlgos.labelPropagation(
      e.repartition(5)).as[(String, String)].collect().toMap
    assert(again == labels)
  }

  test("kCore: K4 plus a pendant — 3-core is exactly the K4; peel cascades on a path") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val e = (k4 :+ ("d" -> "e")).toDF("src", "dst")
    val core3 = GraphAlgos.kCore(e, 3).as[(String, Long)].collect().toMap
    assert(core3 == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L),
      "pendant e must peel off and d's degree drops back to 3")
    // path graph: every 2-core peel cascades from the endpoints → empty
    val path = Seq("p1" -> "p2", "p2" -> "p3", "p3" -> "p4").toDF("src", "dst")
    assert(GraphAlgos.kCore(path, 2).isEmpty)
    // 5-cycle is its own 2-core
    val cyc = Seq("c1" -> "c2", "c2" -> "c3", "c3" -> "c4", "c4" -> "c5", "c5" -> "c1")
      .toDF("src", "dst")
    val core2 = GraphAlgos.kCore(cyc, 2).as[(String, Long)].collect().toMap
    assert(core2.keySet.size == 5 && core2.values.forall(_ == 2L))
  }

  test("kCore result is maximal: every member keeps >= k neighbors inside the core") {
    val e = (0 until 200).flatMap { i =>
      Seq((s"n$i", s"n${(i * 7 + 1) % 200}"), (s"n$i", s"n${(i * 13 + 3) % 200}"),
        (s"n$i", s"n${(i * 29 + 11) % 200}"))
    }.toDF("src", "dst")
    val core = GraphAlgos.kCore(e, 3)
    assert(core.where($"core_degree" < 3).isEmpty, "k-core invariant violated")
    // and it is non-trivial on this 3-out graph
    assert(core.count() > 0)
  }

  test("triangleCount: K4 has 4 triangles; duplicates/reversals collapse") {
    val k4 = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a != b
    } yield (a, b) // every edge in BOTH directions + self-free
    val e = (k4 ++ Seq(("a", "b"), ("d", "e"))).toDF("src", "dst") // dup + pendant
    val r = GraphAlgos.triangleCount(e).as[(Long, Long)].head()
    assert(r == ((7L, 4L)), s"got $r") // 6 K4 edges + pendant; C(4,3)=4 triangles
  }

  test("neighborhoodFunction: exact N(t) below sketch capacity, converges at the diameter") {
    // path a→b→c: balls grow 3 → 5 → 6 and stop
    val nf = GraphAlgos.neighborhoodFunction(
        edges("a" -> "b", "b" -> "c"), maxHops = 5, k = 8)
      .as[(Long, Double)].collect().toMap
    assert(nf == Map(0L -> 3.0, 1L -> 5.0, 2L -> 6.0), s"got $nf")
  }

  test("neighborhoodFunction estimator lands within KMV error at full closure") {
    val n = 300
    val e = (0 until n).flatMap { i =>
      Seq((s"n$i", s"n${(i * 7 + 1) % n}"), (s"n$i", s"n${(i * 13 + 3) % n}"),
        (s"n$i", s"n${(i + 1) % n}"))
    }.toDF("src", "dst")
    val nf = GraphAlgos.neighborhoodFunction(e, maxHops = 15, k = 64)
      .as[(Long, Double)].collect().sortBy(_._1)
    val closure = nf.last._2
    // the graph is strongly connected (it contains the full (i+1) ring), so
    // the true closure is n² pairs; a k=64 KMV shared across all nodes has
    // ~1/√(k−2) ≈ 13% relative error — assert a 2.5σ band
    assert(math.abs(closure - n.toDouble * n) / (n.toDouble * n) < 0.32,
      s"closure estimate $closure vs exact ${n * n}")
    // N(t) is monotone nondecreasing
    assert(nf.map(_._2).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("harmonicCentrality: exact inverse-distance sums below sketch capacity") {
    // path a→b→c (out-distances): hc(a) = 1/1 + 1/2, hc(b) = 1, hc(c) = 0
    val hc = GraphAlgos.harmonicCentrality(
        edges("a" -> "b", "b" -> "c"), maxHops = 5, k = 8)
      .as[(String, Double)].collect().toMap
    assert(hc("a") == 1.5 && hc("b") == 1.0 && hc("c") == 0.0, s"got $hc")
    // out-star: the hub reaches 9 leaves at distance 1, leaves reach nothing
    val star = (1 to 9).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    val hs = GraphAlgos.harmonicCentrality(star, maxHops = 3, k = 16)
      .as[(String, Double)].collect().toMap
    assert(hs("hub") == 9.0 && (1 to 9).forall(i => hs(s"leaf$i") == 0.0))
  }

  test("clusteringProfile: K4 is fully transitive; a path has open wedges only") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
      .toDF("src", "dst")
    val p = GraphAlgos.clusteringProfile(k4)
      .as[(Long, Long, Long, Long)].collect().head
    assert(p == ((4L, 6L, 12L, 12L)), s"K4: 12 wedges all closed, got $p")
    val path = Seq("a" -> "b", "b" -> "c").toDF("src", "dst")
    val q = GraphAlgos.clusteringProfile(path)
      .as[(Long, Long, Long, Long)].collect().head
    assert(q == ((3L, 2L, 1L, 0L)), s"path: one open wedge, got $q")
  }

  test("degreeStats on a known graph") {
    val r = GraphAlgos.degreeStats(
        edges("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "c"))
      .as[(Long, Long, Long, Long)].head()
    // self-loop dropped: 3 nodes, 3 edges, max out = a(2), max in = c(2)
    assert(r == ((3L, 3L, 2L, 2L)))
  }
}
