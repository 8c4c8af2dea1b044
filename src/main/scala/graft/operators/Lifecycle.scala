package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lifecycle scans — SURVEY.md §2.2 (C1, C3, C5, C6, C8).
  *
  * The reference drives incremental processing with epoch columns
  * (`epoch_added / epoch_processing / epoch_processed`) plus mod-hash
  * batching over internal vertex ids. In Spark the batch loop disappears
  * (partitions are the parallel unit), but the same predicates remain useful
  * as INCREMENTAL filters — "what still needs work" — against the lineage
  * checkpointing model, and mod-hash batching remains the right tool to
  * bound memory for huge backfills (process 1/Nth of the corpus per job).
  */
object Lifecycle {

  /** C1 `StreamIds` (`common/gsql/graphrag/StreamIds.gsql:9-13`):
    * `vertex_to_int(v) % ttl_batches == current_batch AND epoch_processed
    * == 0`. The hash is xxhash64 of the id — stable across runs, unlike the
    * reference's load-order `getvid`.
    */
  def modHashBatch(df: DataFrame, idCol: String, nBatches: Int, batch: Int,
      processedCol: Option[String] = None): DataFrame = {
    val base = df.where(pmod(xxhash64(col(idCol)), lit(nBatches)) === batch)
    processedCol.map(c => base.where(col(c).isNull)).getOrElse(base)
  }

  /** C3 `Scan_For_Updates` (`common/gsql/supportai/Scan_For_Updates.gsql:14-44`):
    * top-n never-processed or expired-in-flight rows by added-time priority
    * (HeapAccum → orderBy().limit(), which Catalyst executes as
    * TakeOrderedAndProject — no full sort).
    */
  def scanForUpdates(df: DataFrame, n: Int,
      addedCol: String = "ingested_at",
      processingCol: String = "processing_at",
      processedCol: String = "processed_at",
      expireSeconds: Long = 6 * 3600): DataFrame =
    df.where(
        col(processedCol).isNull &&
          (col(processingCol).isNull ||
            unix_timestamp(current_timestamp()) - unix_timestamp(col(processingCol))
              > expireSeconds))
      .orderBy(col(addedCol))
      .limit(n)

  /** C5 `ECC_Status` (`ECC_Status.gsql:1-9`): processed / in-flight / fresh
    * counts — here over any table with the lifecycle columns.
    */
  def status(df: DataFrame,
      processingCol: String = "processing_at",
      processedCol: String = "processed_at"): DataFrame =
    df.select(
        when(col(processedCol).isNotNull, "processed")
          .when(col(processingCol).isNotNull, "processing")
          .otherwise("fresh").as("state"))
      .groupBy(col("state")).agg(count(lit(1)).as("cnt"))

  /** C6 `Check_Nonexistent_Vertices` (`Check_Nonexistent_Vertices.gsql`):
    * candidate ids with no matching vertex — one anti join.
    */
  def nonexistent(candidateIds: DataFrame, existing: DataFrame, idCol: String): DataFrame =
    candidateIds.join(existing.select(col(idCol)), Seq(idCol), "left_anti")

  /** C8 `get_vertices_or_remove` filter shape (`get_vertices_or_remove.gsql:1-14`):
    * LIKE-filtered scan; removal under the overwrite-table model is
    * `df.where(!pred)` written back.
    */
  def likeScan(df: DataFrame, idCol: String, pattern: String): DataFrame =
    df.where(lower(col(idCol)).like(pattern.toLowerCase))
}
