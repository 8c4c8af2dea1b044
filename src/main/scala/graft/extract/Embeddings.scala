package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic text-column embedding stage — the Spark realization of the
  * reference's embed workers, which vectorize every DocumentChunk
  * (`ecc/app/graphrag/workers.py:115-117,175-206`), every entity description
  * (`workers.py:255-262`) and every community summary
  * (`workers.py:530-560`) through one pooled embedding service.
  *
  * One narrow mapPartitions; the embedder (a pooled model client in
  * production, the deterministic [[HashEmbedder]] here) is constructed once
  * per partition — the Spark analogue of the reference's 20-way semaphore
  * pool. No shuffle: at 10^12 rows this streams at scan speed.
  */
object Embeddings {

  /** (idCol, textCol) → (idCol, embedding). Deterministic in (dim, seed). */
  def embedText(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1536, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        val emb = new HashEmbedder(dim, seed)
        it.map { case (id, text) => (id, emb.embed(if (text == null) "" else text)) }
      }
      .toDF(idCol, "embedding")
  }

  /** Per-group mean-pooled embedding (doc embedding from chunk embeddings,
    * class centroids for labeling / IVF seeding). Bit-deterministic: the
    * group's vectors are collected sorted by `idCol` and folded left in
    * that order (a distributed elementwise float sum would be partition-
    * order-dependent), in double precision.
    *
    * Scale: one partial-agg shuffle keyed by the group; the collect_list is
    * per GROUP (chunks of one doc / members of one class), bounded by group
    * size — the groupBy itself never materializes the corpus anywhere.
    * For web-hot groups, pre-aggregate with a salted two-phase fold
    * ([[graft.operators.Skew]]) at the cost of fixing the salt-group fold
    * order first.
    */
  def centroids(df: DataFrame, keyCol: String, idCol: String,
      embCol: String = "embedding"): DataFrame = {
    val sortedRows = array_sort(collect_list(struct(
      col(idCol), col(embCol).cast("array<double>").as("emb"))))
    val g = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_vecs"), sortedRows.as("rows"))
    val embs = transform(col("rows"), r => r.getField("emb"))
    val summed = aggregate(
      slice(embs, lit(2), greatest(size(embs) - 1, lit(0))),
      element_at(embs, 1),
      (acc, v) => zip_with(acc, v, (a, b) => a + b))
    g.select(col(keyCol), col("n_vecs"),
        transform(summed, x => x / col("n_vecs")).as("centroid"))
      .select(col(keyCol), col("n_vecs"),
        size(col("centroid")).cast("long").as("dim"),
        sqrt(aggregate(transform(col("centroid"), x => x * x), lit(0.0), (a, b) => a + b))
          .as("norm"),
        element_at(col("centroid"), 1).as("c0"),
        col("centroid"))
  }

  /** Deterministic random projection (the Johnson–Lindenstrauss transform
    * with Achlioptas-style ±1 entries, Achlioptas JCSS 2003):
    * `y_j = (Σ_i x_i · s(j,i)) / √k` with the sign `s(j,i)` derived from
    * the FNV-1a fingerprint of the string "j:i" — no RNG state, no stored
    * matrix, the projection is a pure function of the indices. This is the
    * cheap dimension squeeze in front of the ANN scale path: JL preserves
    * pairwise distances within (1±ε) at k = O(log n / ε²), and at 100 TB
    * projecting 1536-dim floats to k=128 cuts every downstream shuffle,
    * broadcast, and index 12× without training anything (contrast
    * [[graft.operators.Pq]], which must fit codebooks).
    *
    * The sign table is O(k·dim) doubles riding the plan as one literal
    * array, so the operator is a single narrow codegen'd pass — zero
    * shuffles. The inner fold runs in ascending-i order, every step a
    * correctly-rounded IEEE op, so outputs are bit-identical across
    * partitionings, runs, and engines (the q_rp oracle recomputes the
    * signs AND the fold exactly in SQL).
    */
  def randomProject(df: DataFrame, dim: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim >= 1 && k >= 1, "randomProject: dim and k must be >= 1")
    // sign = POPCOUNT parity of the full 64-bit fingerprint. Single-bit
    // extraction is structured on short digit strings: bit 0 is literally
    // the XOR-parity of the input bytes' low bits (the final odd multiply
    // preserves it; measured mean norm ratio 0.46 instead of 1), and even
    // bit 32 left two identical rows in a 16×32 table (ratio 0.33). The
    // parity of ALL bits mixes every carry chain — measured balance −4/512,
    // max row correlation at the random-matrix level, mean norm ratio 0.98.
    val signs: Array[Double] = Array.tabulate(k * dim) { idx =>
      val j = idx / dim
      val i = idx % dim
      val h = graft.operators.TextStats.fingerprint64(s"$j:$i")
      if ((java.lang.Long.bitCount(h) & 1) == 0) 1.0 else -1.0
    }
    val s = lit(signs)
    df.select(col(idCol),
      transform(sequence(lit(0), lit(k - 1)), j =>
        aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0), (acc, i) =>
          acc + element_at(col(vecCol), i + 1).cast("double") *
            element_at(s, j * dim + i + 1))
          / lit(math.sqrt(k.toDouble))).as("proj"))
  }
}
