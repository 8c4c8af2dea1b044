package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics over the materialized KG edge tables — the Spark
  * realization of the reference's canned graph-statistics surface
  * (`common/tg_documents/tg_pagerank.json`, `tg_bfs.json`,
  * `get_edge_stats.json` — the documents its agent invokes as installed
  * queries). The reference delegates these to TigerGraph built-ins; here
  * they are DataFrame loops with the same scale discipline as
  * [[graft.resolve.Resolution]]: localCheckpoint truncation per iteration,
  * shuffles keyed by vertex id only (never carrying payload columns), and
  * no driver-side collect beyond scalar counts.
  *
  * Determinism: PageRank accumulates in decimal(38,18) — Spark decimal
  * addition is exact, so grouped sums are partition-order-independent and
  * ranks are bit-identical across runs/parallelism (a double-sum PageRank
  * is NOT, which would break the pinned-constant oracle gates).
  */
object GraphAlgos {

  /** Rank type: ranks live in [0, 1], so 2 integer digits suffice and the
    * narrow precision matters — a decimal(38,18) × decimal(38,18) product
    * exceeds precision 38 and Spark's precision-loss rule crushes its scale
    * to 6; decimal(20,18) × decimal(6,5) stays exact at scale 23.
    */
  private val D = "decimal(20,18)"

  /** One-row degree/shape summary of an edge table (src, dst). */
  def degreeStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
    val outD = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val inD = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id"))).distinct()
    nodes.agg(count(lit(1)).as("n_nodes")).crossJoin(
      e.agg(count(lit(1)).as("n_edges"))).crossJoin(
      outD.agg(max(col("deg")).as("max_out_deg"))).crossJoin(
      inD.agg(max(col("deg")).as("max_in_deg")))
  }

  /** PageRank, the tg_pagerank formulation: rank(v) = (1−d)/N + d·Σ_{u→v}
    * rank(u)/outdeg(u), fixed iteration count, dangling mass not
    * redistributed (TigerGraph's tg_pagerank makes the same choice). Edge
    * multiplicity counts — pass pre-deduped edges for simple-graph
    * semantics. Each iteration is one join + one aggregate, both keyed by
    * vertex id; ranks are a narrow (id, decimal) frame so a 10-iteration
    * run shuffles O(10·E) ids, no payload. localCheckpoint per iteration
    * truncates the plan (10^12-scale corollary: lineage stays O(1) deep).
    */
  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val dDec = new java.math.BigDecimal(damping.toString)
    // exact-width decimal for the damping factor: a fixed narrow cast would
    // silently HALF_UP-quantize an unusual damping (e.g. 0.123456 at scale
    // 5); the product's precision must still fit 38 (dP + 20 + 1), which
    // any damping in (0, 1) with ≤ 17 significant digits does
    val dampingType = {
      val dp = math.max(dDec.precision, dDec.scale)
      require(dp + 21 <= 38, s"damping $damping too precise for exact decimal arithmetic")
      s"decimal($dp,${dDec.scale})"
    }
    val base = (BigDecimal(1) - BigDecimal(dDec)) / BigDecimal(n)
    val init = (BigDecimal(1) / BigDecimal(n)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    val baseLit = lit(base.setScale(18, BigDecimal.RoundingMode.HALF_UP).bigDecimal).cast(D)
    // divisor as a narrow decimal: dividing decimal(38,18) by a bare LONG
    // makes Spark's precision-loss rule crush the result scale to 6; a
    // decimal(10,0) divisor keeps ≥18 fractional digits in the quotient
    val outDeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("decimal(10,0)").as("out_deg")).localCheckpoint(true)

    var ranks = nodes.select(col("id"), lit(init.bigDecimal).cast(D).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("out_deg")).cast(D).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).cast(D).as("in_sum"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (baseLit + (lit(dDec).cast(dampingType) *
              coalesce(col("in_sum"), lit(0).cast(D))).cast(D))
            .cast(D).as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Personalized PageRank: the teleport mass lands ONLY on the seed set —
    * rank(v) = (1−d)·p(v) + d·Σ_{u→v} rank(u)/outdeg(u) with p uniform over
    * seeds and zero elsewhere (Jeh & Widom, WWW'03; TigerGraph ships the
    * same as tg_pagerank_pers). Ranks measure proximity TO the seeds —
    * this is the principled "expand around the query entities" scorer for
    * GraphRAG-style retrieval: where [[bfsDistances]] counts hops,
    * PPR weights them by path multiplicity and decay, so it ranks within a
    * hop level. Same scale and determinism discipline as [[pageRank]]:
    * per-iteration shuffles keyed by vertex id only, exact decimal
    * accumulation (bit-identical across partitionings — pinned-constant
    * oracle safe), localCheckpoint truncation.
    */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .localCheckpoint(true)
    val seedIds = seeds.select(col("id")).distinct().localCheckpoint(true)
    val nSeeds = seedIds.count()
    require(nSeeds > 0, "personalizedPageRank needs at least one seed")
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .join(seedIds.withColumn("is_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    val dDec = new java.math.BigDecimal(damping.toString)
    val dampingType = {
      val dp = math.max(dDec.precision, dDec.scale)
      require(dp + 21 <= 38, s"damping $damping too precise for exact decimal arithmetic")
      s"decimal($dp,${dDec.scale})"
    }
    val base = (BigDecimal(1) - BigDecimal(dDec)) / BigDecimal(nSeeds)
    val init = (BigDecimal(1) / BigDecimal(nSeeds)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    val zero = lit(BigDecimal(0).bigDecimal).cast(D)
    val baseCol = when(col("is_seed"),
      lit(base.setScale(18, BigDecimal.RoundingMode.HALF_UP).bigDecimal).cast(D))
      .otherwise(zero)
    val outDeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("decimal(10,0)").as("out_deg")).localCheckpoint(true)

    var ranks = nodes
      .select(col("id"),
        when(col("is_seed"), lit(init.bigDecimal).cast(D)).otherwise(zero).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("out_deg")).cast(D).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).cast(D).as("in_sum"))
      ranks = nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (baseCol + (lit(dDec).cast(dampingType) *
              coalesce(col("in_sum"), zero)).cast(D))
            .cast(D).as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Global triangle count over the undirected simple graph — one row
    * (n_edges, n_triangles). Edge-iterator formulation: orient every edge
    * low→high, join wedges (a<b<c) against the closing edge — each
    * triangle counted exactly once, no post-division. At web scale the
    * wedge join keys on the middle vertex; hub skew is bounded by the
    * standard degree-ordering trick (orienting low-degree → high-degree
    * instead of id order) — the id orientation here keeps the oracle
    * SQL-identical.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .where(col("s") =!= col("t")).distinct()
      .localCheckpoint(true)
    val e1 = und.select(col("s").as("a"), col("t").as("b"))
    val e2 = und.select(col("s").as("b"), col("t").as("c"))
    val e3 = und.select(col("s").as("a"), col("t").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"), "left_semi")
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Label-propagation community detection (Raghavan et al. 2007; the
    * cheap one-pass-per-round alternative to [[graft.community.Louvain]]
    * when modularity optimality is not worth the convergence loop — e.g.
    * a first-cut blocking key for entity resolution at full-web scale).
    * Synchronous variant with a deterministic vote: each round every node
    * adopts the most frequent label among its neighbors, ties to the
    * SMALLEST label (classic LPA breaks ties randomly — useless for
    * reproducible pipelines; the deterministic tie is the same
    * total-order discipline as the R2 canonical pick). Runs to label
    * fixpoint or `maxIters` (synchronous LPA can 2-cycle on bipartite
    * structure; the bound terminates it).
    *
    * Scale shape per round: one edge×label join + one (node, label)
    * partial-agg count + one min_by vote per node — all shuffles keyed by
    * vertex id, labels are the only payload. localCheckpoint per round.
    */
  def labelPropagation(edges: DataFrame, maxIters: Int = 10): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .where(col("s") =!= col("t")).distinct()
      .localCheckpoint(true)
    val both = und.select(col("s").as("src"), col("t").as("dst"))
      .unionByName(und.select(col("t").as("src"), col("s").as("dst")))
      .localCheckpoint(true)
    var labels = both.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint(true)
    var i = 0
    var changed = true
    while (i < maxIters && changed) {
      val votes = both
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("id"))
        .agg(min_by(col("label"), struct((-col("cnt")).as("nc"), col("label"))).as("label"))
      val next = votes.localCheckpoint(true)
      val nChanged = next.join(labels.withColumnRenamed("label", "old"), "id")
        .where(col("label") =!= col("old")).limit(1).count()
      changed = nChanged > 0
      labels = next
      i += 1
    }
    labels
  }

  /** k-core of the undirected simple graph: the maximal subgraph in which
    * every vertex has degree ≥ k (Seidman 1983; TigerGraph ships the same
    * peel as tg_kcore). Returns (id, core_degree) for the surviving
    * vertices — the standard dense-nucleus extractor for a web-scale KG:
    * entities surviving a high k are the structurally load-bearing ones,
    * and peeling off the 1-core drops extraction-noise pendants.
    *
    * Iterative peel: drop all vertices under degree k, recompute, repeat to
    * fixpoint — each round is one partial-agg degree count plus two
    * semi-joins, everything keyed by vertex id only (no payload columns);
    * localCheckpoint truncates lineage per round. Rounds are bounded by the
    * peel depth (the degeneracy ordering's layer count), a small constant
    * on power-law graphs — and each round SHRINKS the edge set, so unlike
    * fixed-iteration PageRank the work contracts as it converges.
    */
  def kCore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    var e = edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .where(col("s") =!= col("t")).distinct()
      .localCheckpoint(true)
    var before = e.count()
    var changed = before > 0
    while (changed) {
      val keep = e.select(col("s").as("id")).unionByName(e.select(col("t").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("id"))
        .localCheckpoint(true)
      val next = e
        .join(keep.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
        .join(keep.withColumnRenamed("id", "t"), Seq("t"), "left_semi")
        .localCheckpoint(true)
      val after = next.count()
      changed = after < before && after > 0
      before = after
      e = next
    }
    e.select(col("s").as("id")).unionByName(e.select(col("t").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("core_degree"))
  }

  /** Neighborhood function N(t) = Σ_v |ball(v, t)| — the distance profile
    * a whole-graph BFS-per-node cannot compute at scale. This is the
    * HyperANF/HyperBall algorithm shape (Boldi & Vigna, WWW'11): every
    * vertex carries a union-monotone distinct-count sketch of its out-ball,
    * and one hop is sketch(v) ∪= ⋃_{v→u} sketch(u) — |V| simultaneous BFS
    * closures in O(E·k) work per hop instead of O(V·E) total. KMV bottom-k
    * registers ([[graft.functions.KmvSketch]] semantics) replace
    * HyperLogLog here because KMV state is a plain sorted long array:
    * union = `slice(array_sort(array_distinct(concat(...))), 1, k)` — pure
    * integer column ops, bit-identical under any partitioning, and EXACT
    * (not estimated) whenever a ball holds fewer than k vertices — which
    * makes small-graph gates pin integers while the same code estimates at
    * web scale.
    *
    * Returns (t, n_pairs) for t = 0..maxHops, stopping early once N(t)
    * converges (the effective-diameter read-off point). Per-hop shuffles
    * are keyed by vertex id carrying ≤ k longs each. The per-node
    * neighbor-union fold is bounded by out-degree·k; for web-hub degrees
    * pre-reduce with a salted two-phase merge ([[graft.operators.Skew]])
    * before the final per-id union.
    */
  def neighborhoodFunction(edges: DataFrame, maxHops: Int, k: Int = 64): DataFrame = {
    require(k >= 2 && maxHops >= 0, "neighborhoodFunction: k >= 2, maxHops >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    // register hash = splitmix64-finalized FNV: raw FNV's high bits are
    // measurably non-uniform on short ids (kth-min estimate read 476 on a
    // 300-node graph), and the KMV estimator is exactly a high-bit
    // statistic. Stored SKEWED (h ^ Long.MinValue) so signed array_sort
    // realizes the unsigned KMV order; unskewed only inside the estimator.
    // A UDF is fine here: hashing runs once per NODE at init, off the
    // per-hop path.
    val nodeHash = udf((s: String) =>
      Dedup.mix64(TextStats.fingerprint64(s)) ^ Long.MinValue)
    var sk = nodes.select(col("id"),
        array(nodeHash(col("id").cast("string"))).as("sk"))
      .localCheckpoint(true)
    val est = when(size(col("sk")) < k, size(col("sk")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(18446744073709551616.0) /
        (element_at(col("sk"), k).cast("double") + lit(9.223372036854775808e18)))
    def total(): Double = sk.agg(sum(est)).as[Double].collect().head
    val out = scala.collection.mutable.ArrayBuffer((0L, total()))
    var t = 1
    var converged = false
    while (t <= maxHops && !converged) {
      val nb = e.join(sk.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k)
          .as("nb"))
      sk = sk.join(nb, Seq("id"), "left")
        .select(col("id"),
          slice(array_sort(array_distinct(concat(col("sk"),
            coalesce(col("nb"), array().cast("array<bigint>"))))), 1, k).as("sk"))
        .localCheckpoint(true)
      val n = total()
      converged = n == out.last._2
      if (!converged) out += ((t.toLong, n))
      t += 1
    }
    out.toSeq.toDF("t", "n_pairs")
  }

  /** Harmonic centrality for EVERY vertex — the payload HyperBall was built
    * for (Boldi & Vigna; Marchiori & Latora's centrality): hc(v) =
    * Σ_{u≠v} 1/d(v,u) = Σ_{t≥1} (|ball(v,t)| − |ball(v,t−1)|)/t, computed
    * for all vertices simultaneously from the same KMV ball sketches as
    * [[neighborhoodFunction]] — O(E·k) per hop where BFS-per-node is
    * O(V·E) total. Exact below sketch capacity (ball counts are integers),
    * estimated beyond. Uses out-distances d(v,·); pass reversed edges for
    * the in-distance form. Returns (id, hc).
    */
  def harmonicCentrality(edges: DataFrame, maxHops: Int, k: Int = 64): DataFrame = {
    require(k >= 2 && maxHops >= 1, "harmonicCentrality: k >= 2, maxHops >= 1")
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst").localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val nodeHash = udf((s: String) =>
      Dedup.mix64(TextStats.fingerprint64(s)) ^ Long.MinValue)
    val est = when(size(col("sk")) < k, size(col("sk")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(18446744073709551616.0) /
        (element_at(col("sk"), k).cast("double") + lit(9.223372036854775808e18)))
    var state = nodes.select(col("id"),
        array(nodeHash(col("id").cast("string"))).as("sk"),
        lit(1.0).as("cnt"), lit(0.0).as("hc"))
      .localCheckpoint(true)
    var t = 1
    var prevTotal = state.count().toDouble // Σ cnt at t=0 (all balls = self)
    var converged = false
    while (t <= maxHops && !converged) {
      val nb = e.join(state.select(col("id").as("dst"), col("sk")), "dst")
        .groupBy(col("src").as("id"))
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k)
          .as("nb"))
      state = state.join(nb, Seq("id"), "left")
        .select(col("id"),
          slice(array_sort(array_distinct(concat(col("sk"),
            coalesce(col("nb"), array().cast("array<bigint>"))))), 1, k).as("sk"),
          col("cnt"), col("hc"))
        .withColumn("cnt_new", est)
        .select(col("id"), col("sk"), col("cnt_new").as("cnt"),
          (col("hc") + greatest(col("cnt_new") - col("cnt"), lit(0.0)) / lit(t.toDouble))
            .as("hc"))
        .localCheckpoint(true)
      val total = state.agg(sum(col("cnt"))).collect().head.getDouble(0)
      converged = total == prevTotal
      prevTotal = total
      t += 1
    }
    state.select(col("id"), col("hc"))
  }

  /** Global clustering profile of the undirected simple graph — one row
    * (n_nodes, n_edges, n_wedges, n_closed_wedges): n_wedges =
    * Σ_v deg(v)·(deg(v)−1)/2, n_closed_wedges = 3·triangles. The global
    * clustering coefficient (transitivity) is closed/wedges — emitted as
    * the two EXACT integers rather than the ratio, so the result
    * hash-compares across engines; the division is the caller's one line.
    * Same triangle join as [[triangleCount]] plus one degree aggregate;
    * the integral `div` keeps the wedge count exact where a double
    * division would round past 2^53 on a web-scale degree sequence.
    */
  def clusteringProfile(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .where(col("s") =!= col("t")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("s").as("id")).unionByName(und.select(col("t").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val e1 = und.select(col("s").as("a"), col("t").as("b"))
    val e2 = und.select(col("s").as("b"), col("t").as("c"))
    val e3 = und.select(col("s").as("a"), col("t").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"),
        expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg((count(lit(1)) * 3).as("n_closed_wedges")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_closed_wedges"))
  }

  /** Multi-source BFS hop distances: (id, dist) for every vertex reachable
    * from `seeds` within `maxHops` (seeds at dist 0). Frontier loop with
    * anti-join de-visit; the frontier is ids only. Early-exits on an empty
    * frontier (scalar limit-count per hop, bounded by maxHops ≤ diameter).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .localCheckpoint(true)
    var visited = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist")).localCheckpoint(true)
    var frontier = visited
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      val next = e
        .join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), lit(hop.toLong).as("dist"))
        .localCheckpoint(true)
      if (next.limit(1).count() == 0) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
      }
      hop += 1
    }
    visited
  }
}
