package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized IVF index — the warehouse-scale form of [[Similarity.ivfTopK]]
  * (reference: the HNSW-configured vector store `common/py_schemas/
  * schemas.py:112-117` is likewise a standing index, not a per-query build).
  *
  * The in-memory `ivfTopK` recomputes pivots (corpus count + 2 Lloyd passes +
  * a k×dim driver collect) on EVERY call — fine for one gate query, wasteful
  * the moment two queries share a corpus, and impossible at 10^12 rows where
  * the assignment pass alone is a full-corpus job. `build` runs that work
  * ONCE and persists two tables under `indexDir`:
  *
  *   pivots/   (pivot_id, pivot_emb)            — ~√N rows, read per probe
  *   vectors/  cluster=<pid>/ (neighbor_id, c_emb) — corpus partitioned by
  *             its assigned cluster id
  *
  * `topK` then serves any number of query batches: probe the pivot table
  * (√N×dim driver-side — small by construction), turn the probed cluster set
  * into a LITERAL `cluster IN (...)` predicate, and let the parquet scan
  * prune to nProbe/nPivots of the partition directories — the scan never
  * touches the other clusters' files (ExplainAudit check #8 asserts the
  * PartitionFilters reach the scan). Scoring reuses the exact
  * [[Similarity.scoreProbes]] tail, so the materialized path is
  * result-identical to `ivfTopK(pivotsOverride = pivots)`.
  */
object IvfIndex {

  def pivotsPath(indexDir: String) = s"$indexDir/pivots"
  def vectorsPath(indexDir: String) = s"$indexDir/vectors"

  /** One-time index build: Lloyd-refined pivots, one assignment pass, write
    * `partitionBy("cluster")`. Returns the number of pivots.
    */
  def build(corpus: DataFrame, indexDir: String, p: Similarity.IvfParams = Similarity.IvfParams(),
      idCol: String = "vec_id", embCol: String = "embedding"): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n =
      if (p.nPivots > 0) p.nPivots
      else math.max(4, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)
    val pivotArr = Similarity.kmeansPivots(corpus, n, iters = 2, seed = p.seed, idCol, embCol)
    pivotArr.toSeq.toDF("pivot_id", "pivot_emb")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(pivotsPath(indexDir))
    Similarity.assignClusters(corpus, pivotArr, idCol, embCol)
      .write.mode(SaveMode.Overwrite).partitionBy("cluster").parquet(vectorsPath(indexDir))
    pivotArr.length
  }

  /** Incremental index maintenance: assign a NEW vector batch to the
    * EXISTING pivots and append it into the cluster-partitioned layout —
    * O(batch) work (one narrow assignment pass over the batch; new parquet
    * files land inside only the touched cluster directories, standing files
    * are never rewritten). No re-train: serving stays result-identical to a
    * full rebuild WITH THE SAME PIVOTS over the union corpus. The standard
    * IVF maintenance contract (FAISS `add` after `train`) and its caveat
    * apply: pivots drift as the corpus distribution moves, so rebuild once
    * the appended fraction is large; the returned (nStanding, nAppended)
    * gives the caller that ratio.
    */
  def append(batch: DataFrame, indexDir: String,
      idCol: String = "vec_id", embCol: String = "embedding"): (Long, Long) = {
    val spark = batch.sparkSession
    val pivotArr = loadPivots(spark, indexDir)
    require(pivotArr.nonEmpty, s"append: no pivot table under $indexDir — build first")
    val standing = spark.read.parquet(vectorsPath(indexDir)).count()
    Similarity.assignClusters(batch, pivotArr, idCol, embCol)
      .write.mode(SaveMode.Append).partitionBy("cluster").parquet(vectorsPath(indexDir))
    (standing, batch.count())
  }

  /** Load the pivot table (≈√N rows) back as the driver-side array the
    * probe/assign primitives take.
    */
  def loadPivots(spark: SparkSession, indexDir: String): Array[(Long, Array[Float])] = {
    import spark.implicits._
    spark.read.parquet(pivotsPath(indexDir))
      .select(col("pivot_id"), col("pivot_emb"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  /** Approximate top-k served FROM the index: no pivot recompute, no
    * full-corpus assignment — the scan is pruned to the probed clusters'
    * partition directories. Result-identical to
    * `Similarity.ivfTopK(corpus, queries, k, pivotsOverride = pivots)`.
    */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame, k: Int,
      nProbe: Int = 4, idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val pivotArr = loadPivots(spark, indexDir)
    val probes = probesFor(spark, pivotArr, queries, nProbe, idCol, embCol)
    Similarity.scoreProbes(prunedVectors(spark, indexDir, probes._2), probes._1, k)
  }

  /** The probe frame plus its distinct probed-cluster ids (collected — the
    * set is ≤ |queries|·nProbe, and it must be a literal for the scan's
    * partition pruning; a join would ship every partition through the
    * exchange first).
    */
  private def probesFor(spark: SparkSession, pivotArr: Array[(Long, Array[Float])],
      queries: DataFrame, nProbe: Int, idCol: String, embCol: String): (DataFrame, Array[Long]) = {
    val probes = Similarity.probeClusters(queries, pivotArr, nProbe, idCol, embCol)
      .localCheckpoint(true) // probe once; reused for the literal AND the join
    val probed = probes.select("cluster").distinct()
      .collect().map(_.getLong(0)).sorted
    (probes, probed)
  }

  /** Index scan restricted to the probed clusters — a literal IN over the
    * partition column, so pruning happens at file-listing time.
    */
  private def prunedVectors(spark: SparkSession, indexDir: String, probed: Array[Long]): DataFrame =
    spark.read.parquet(vectorsPath(indexDir))
      .where(col("cluster").isin(probed.map(java.lang.Long.valueOf).toIndexedSeq: _*))
}
