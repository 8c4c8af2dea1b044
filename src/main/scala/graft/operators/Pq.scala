package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding-scale ANN — the memory half of the
  * similarity-search scale path ([[Similarity]]/[[IvfIndex]] prune the
  * candidate set; PQ compresses the vectors those candidates are scored
  * against). A 1536-dim float32 vector (6 KB) becomes `m` one-byte codes:
  * at 10^12 documents the full corpus codebook + codes fit where raw
  * vectors cannot, and asymmetric-distance scoring (ADC) ranks candidates
  * from a per-query lookup table without touching the raw vectors at all
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public method).
  *
  * Scale shape: training shuffles (subspace, code) keyed partial sums —
  * bounded keys (m·k rows) — never raw vectors; encoding is a narrow map
  * with the codebook broadcast (m·k·dsub floats, a few KB); ADC scoring is
  * a narrow map with the per-query LUT broadcast. Determinism: seeded
  * init from the id-ordered sample, ties to the lowest code index; means
  * accumulate per (subspace, code) partial sums of floats in double —
  * byte-stable on a fixed corpus at fixed partitioning, and the gate
  * (recall bound, boolean) is robust to last-ulp jitter either way.
  */
object Pq {

  /** Per-dimension (min, max) for scalar quantization, bounded by the
    * embedding dimensionality. One partial-agg pass: the posexplode is
    * narrow and every partition pre-reduces to ≤ dim rows before the
    * dim-keyed shuffle, so the collect is O(dim) regardless of corpus
    * size — the same bounded-driver-state contract as the IVF pivots.
    */
  def sqStats(corpus: DataFrame, vecCol: String = "embedding"): Array[(Double, Double)] =
    corpus.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  /** Scalar (int8-style) quantization — the OTHER memory lever next to PQ:
    * per-dimension affine codes `q_i = floor((x_i − min_i)·maxCode /
    * (max_i − min_i) + 0.5)` clamped to [0, maxCode], with constant
    * dimensions pinned to code 0. At maxCode = 255 a float32 corpus
    * shrinks 4× with reconstruction error bounded by half a step per
    * dimension ((max−min)/(2·maxCode)) — the format FAISS calls SQ8 and
    * vector stores ship as "int8 embeddings". Unlike PQ the codes preserve
    * per-dimension structure, so range filters and ADC-style integer dot
    * products work directly on the compressed column.
    *
    * Returns (idCol, codes array<int>). The stats ride the plan as one
    * literal array each, so encoding is a narrow codegen'd pass — zero
    * shuffles at any corpus size. Every arithmetic step is a correctly-
    * rounded IEEE double op in a fixed order, so codes are bit-identical
    * across partitionings, runs, and engines (the q_sq8 oracle recomputes
    * them exactly in SQL).
    */
  def sqEncode(
      corpus: DataFrame,
      stats: Array[(Double, Double)],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCode: Int = 255): DataFrame = {
    require(maxCode >= 1, "sqEncode: maxCode must be >= 1")
    val mins = lit(stats.map(_._1))
    val maxs = lit(stats.map(_._2))
    corpus.select(
      col(idCol),
      transform(col(vecCol), (x, i) => {
        val mn = element_at(mins, i + 1)
        val mx = element_at(maxs, i + 1)
        when(mx > mn,
          least(lit(maxCode), greatest(lit(0),
            floor((x.cast("double") - mn) * lit(maxCode.toDouble) / (mx - mn) + lit(0.5))
              .cast("int"))))
          .otherwise(lit(0))
      }).as("codes"))
  }

  /** Midpoint reconstruction of [[sqEncode]] codes:
    * `x̂_i = min_i + q_i·(max_i − min_i)/maxCode`. Error per dimension is
    * within half a quantization step (PqSpec asserts the bound). */
  def sqDecode(
      codes: DataFrame,
      stats: Array[(Double, Double)],
      idCol: String = "vec_id",
      codesCol: String = "codes",
      maxCode: Int = 255): DataFrame = {
    val mins = lit(stats.map(_._1))
    val maxs = lit(stats.map(_._2))
    codes.select(
      col(idCol),
      transform(col(codesCol), (q, i) => {
        val mn = element_at(mins, i + 1)
        val mx = element_at(maxs, i + 1)
        (mn + q.cast("double") * (mx - mn) / lit(maxCode.toDouble)).cast("float")
      }).as("vec_approx"))
  }

  final case class Params(
      m: Int = 8, // subspaces
      k: Int = 16, // codes per subspace
      iters: Int = 3, // Lloyd refinement passes
      /** codebook init/training sample bound — collected to the driver. */
      sampleCap: Int = 4096)

  /** codebooks(sub)(code) = centroid of that code's subvectors (dsub dims). */
  type Codebooks = Array[Array[Array[Float]]]

  private def subvec(v: Array[Float], sub: Int, dsub: Int): Array[Float] =
    java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub)

  private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Nearest code index, ties to the lowest index (deterministic). */
  private def nearest(cb: Array[Array[Float]], x: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cb.length) {
      val d = sqDist(cb(c), x)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic Lloyd over a driver-side sample: init = first k
    * distinct points in sample order, updates in sample order, empty codes
    * keep their previous centroid.
    */
  private def lloyd(xs: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val d = xs.head.length
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
    xs.iterator.takeWhile(_ => init.length < k).foreach { x =>
      if (seen.add(x.toSeq)) init += x
    }
    // pad under-filled codebooks by cycling over the DISTINCT points
    // collected so far (duplicates never attract points — lowest-index
    // tie-break — so padding only has to keep the array well-formed)
    val nDistinct = math.max(1, init.length)
    var pad = 0
    while (init.length < k) { init += init(pad % nDistinct); pad += 1 }
    var cb = init.toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      xs.foreach { x =>
        val c = nearest(cb, x)
        counts(c) += 1
        var i = 0
        while (i < d) { sums(c)(i) += x(i); i += 1 }
      }
      cb = Array.tabulate(k) { c =>
        if (counts(c) == 0) cb(c)
        else Array.tabulate(d)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      it += 1
    }
    cb
  }

  /** Id-ordered training sample, collected once (bounded by sampleCap) —
    * the standard PQ recipe: codebooks only need to cover the marginal
    * distribution, so they train on a sample even at billion-vector scale;
    * encoding is the distributed pass.
    */
  private def collectSample(corpus: DataFrame, cap: Int,
      idCol: String, embCol: String): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col(idCol).cast("string"), col(embCol))
      .as[(String, Array[Float])]
      .orderBy(col(idCol).cast("string")).limit(cap)
      .collect().map(_._2)
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    sample
  }

  /** Train per-subspace codebooks with k-means over the driver sample. */
  def train(corpus: DataFrame, p: Params,
      idCol: String = "vec_id", embCol: String = "embedding"): Codebooks = {
    val sample = collectSample(corpus, p.sampleCap, idCol, embCol)
    val dim = sample.head.length
    require(dim % p.m == 0, s"dim $dim not divisible by m=${p.m}")
    val dsub = dim / p.m
    Array.tabulate(p.m) { sub => lloyd(sample.map(subvec(_, sub, dsub)), p.k, p.iters) }
  }

  // -------------------------------------------------- residual PQ (IVF-PQ)

  /** Residual (IVF-PQ) model: a coarse quantizer over whole vectors plus
    * per-subspace codebooks over the RESIDUAL x − coarse(x). Flat PQ
    * collapses same-cluster vectors onto near-identical codes and loses
    * the within-cluster ordering exact top-k is made of (measured 0.5
    * recall@10 on the clustered gate corpus even at k=256); quantizing the
    * residual keeps the fine geometry — the reason every billion-scale ANN
    * system (FAISS IVFADC) composes the two.
    */
  final case class ResidualParams(
      coarseK: Int = 64, m: Int = 8, k: Int = 256, iters: Int = 5,
      sampleCap: Int = 4096)

  final case class ResidualModel(coarse: Array[Array[Float]], codebooks: Codebooks)
      extends Serializable

  def trainResidual(corpus: DataFrame, rp: ResidualParams,
      idCol: String = "vec_id", embCol: String = "embedding"): ResidualModel = {
    val sample = collectSample(corpus, rp.sampleCap, idCol, embCol)
    val dim = sample.head.length
    require(dim % rp.m == 0, s"dim $dim not divisible by m=${rp.m}")
    val dsub = dim / rp.m
    val coarse = lloyd(sample, rp.coarseK, rp.iters)
    val residuals = sample.map { x =>
      val c = coarse(nearest(coarse, x))
      Array.tabulate(dim)(i => x(i) - c(i))
    }
    val codebooks = Array.tabulate(rp.m) { sub =>
      lloyd(residuals.map(subvec(_, sub, dsub)), rp.k, rp.iters)
    }
    ResidualModel(coarse, codebooks)
  }

  /** Distributed residual encoding: (id, coarse_code, codes). */
  def encodeResidual(corpus: DataFrame, model: ResidualModel,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val m = model.codebooks.length
    val dsub = model.codebooks.head.head.length
    corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val mdl = bc.value
        it.map { case (id, v) =>
          val cc = nearest(mdl.coarse, v)
          val cen = mdl.coarse(cc)
          val r = Array.tabulate(v.length)(i => v(i) - cen(i))
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) { codes(s) = nearest(mdl.codebooks(s), subvec(r, s, dsub)); s += 1 }
          (id, cc, codes)
        }
      }
      .toDF(idCol, "coarse_code", "codes")
  }

  /** IVF-ADC top-k (the full FAISS-style composition): each query probes
    * its `nProbe` best coarse lists by inner product and ADC-scores ONLY
    * rows assigned to those lists — the scan shrinks to the probed
    * fraction, and with the codes table partitioned by `coarse_code` the
    * probe prunes at file-listing time exactly like [[IvfIndex.topK]].
    * `nProbe >= coarseK` degenerates to [[adcTopKResidual]] (asserted in
    * PqSpec).
    */
  def ivfAdcTopK(queries: DataFrame, codes: DataFrame, model: ResidualModel,
      topK: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = model.codebooks.length
    val k = model.codebooks.head.length
    val dsub = model.codebooks.head.head.length
    val qs = queries.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])].collect()
    // per query: coarse-dot table + probed list set + residual LUT
    val luts = qs.map { case (qid, qv) =>
      val coarseLut = model.coarse.map(c => graft.extract.VectorOps.dot(qv, c))
      val probed = coarseLut.zipWithIndex
        .sortBy { case (d, i) => (-d, i) }.take(math.min(nProbe, coarseLut.length))
        .map(_._2).toSet
      val lut = Array.ofDim[Double](m, k)
      var s = 0
      while (s < m) {
        val q = subvec(qv, s, dsub)
        var c = 0
        while (c < k) { lut(s)(c) = graft.extract.VectorOps.dot(q, model.codebooks(s)(c)); c += 1 }
        s += 1
      }
      (qid, coarseLut, probed, lut)
    }
    val allProbed = luts.flatMap(_._3).toSet
    val bc = spark.sparkContext.broadcast(luts)
    val scored = codes.select(col(idCol).cast("long"), col("coarse_code"), col("codes"))
      // the coarse_code ∈ probed predicate is a plain IN filter — pushable
      // to the scan / partition pruning when the table is laid out by list
      .where(col("coarse_code").isin(allProbed.toSeq.map(_.asInstanceOf[Any]): _*))
      .as[(Long, Int, Array[Int])]
      .mapPartitions { it =>
        val ls = bc.value
        it.flatMap { case (id, cc, cs) =>
          ls.iterator.filter(_._3.contains(cc)).map { case (qid, coarseLut, _, lut) =>
            var score = coarseLut(cc); var s = 0
            while (s < cs.length) { score += lut(s)(cs(s)); s += 1 }
            (qid, id, score)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_dot")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** Residual ADC top-k: score(q, x) = dot(q, coarse(x)) + Σ_sub
    * lut(sub, code) — one coarse-table lookup plus m residual lookups per
    * candidate, raw vectors never touched.
    */
  def adcTopKResidual(queries: DataFrame, codes: DataFrame, model: ResidualModel,
      topK: Int, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    // full scan = probing every coarse list; PqSpec asserts the identity,
    // and the delegation keeps the LUT/score/window logic in ONE place
    ivfAdcTopK(queries, codes, model, topK, nProbe = model.coarse.length, idCol, embCol)

  /** Encode every vector as m small codes — the distributed compression
    * pass: narrow map, codebooks broadcast, output (id, codes). */
  def encode(corpus: DataFrame, codebooks: Codebooks,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebooks)
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    corpus.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bc.value
        it.map { case (id, v) =>
          val codes = new Array[Int](m)
          var s = 0
          while (s < m) { codes(s) = nearest(cb(s), subvec(v, s, dsub)); s += 1 }
          (id, codes)
        }
      }
      .toDF(idCol, "codes")
  }

  /** Exact inner-product top-k (the uncompressed baseline ADC approximates;
    * cosine-ranking [[Similarity.bruteForceTopK]] is the wrong yardstick on
    * unnormalized vectors). Broadcast queries, codegen'd zip_with/aggregate
    * dot, per-query top-k window.
    */
  def exactDotTopK(corpus: DataFrame, queries: DataFrame, topK: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(embCol).as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("dot", expr(
        "aggregate(zip_with(q_emb, c_emb, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (a, x) -> a + x)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }

  /** ADC top-k: for each query, build the m×k lookup table of subspace
    * dots once, then score every encoded vector as the sum of m table
    * lookups — no raw corpus vectors touched. Queries are bounded (top-k
    * retrieval), so the LUTs broadcast; scoring is a narrow map over the
    * codes table followed by a per-query top-k window.
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebooks: Codebooks,
      topK: Int, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val k = codebooks.head.length
    val dsub = codebooks.head.head.length
    val qs = queries.select(col(idCol).cast("long"), col(embCol))
      .as[(Long, Array[Float])].collect()
    val luts = qs.map { case (qid, qv) =>
      val lut = Array.ofDim[Double](m, k)
      var s = 0
      while (s < m) {
        val q = subvec(qv, s, dsub)
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          val cb = codebooks(s)(c)
          while (i < dsub) { d += q(i).toDouble * cb(i); i += 1 }
          lut(s)(c) = d
          c += 1
        }
        s += 1
      }
      (qid, lut)
    }
    val bc = spark.sparkContext.broadcast(luts)
    val scored = codes.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { it =>
        val ls = bc.value
        it.flatMap { case (id, cs) =>
          ls.iterator.map { case (qid, lut) =>
            var score = 0.0; var s = 0
            while (s < cs.length) { score += lut(s)(cs(s)); s += 1 }
            (qid, id, score)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_dot")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
  }
}
