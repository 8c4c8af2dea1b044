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
}
