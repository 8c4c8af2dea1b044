package graft.extract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
