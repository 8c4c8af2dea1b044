package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LineageRow

/** Thin Iceberg-style table catalog over a Parquet directory layout
  * (SURVEY.md §7.1: no iceberg-spark-runtime jar ships in /opt/spark/jars and
  * the environment is offline, so v1 provides the properties the pipeline
  * relies on — atomic stage commits via Spark's _SUCCESS marker + idempotent
  * overwrite, schema-on-write, one path per table — behind a surface narrow
  * enough to swap for `writeTo(...).createOrReplace` / MERGE INTO when a real
  * Iceberg runtime is present).
  */
final class Catalog(val root: String, val spark: SparkSession) {

  def path(table: String): String = s"$root/$table"

  def write(table: String, df: DataFrame, partitions: Option[Int] = None): Unit = {
    val out = partitions.map(n => df.repartition(n)).getOrElse(df)
    out.write.mode(SaveMode.Overwrite).parquet(path(table))
  }

  /** Write + row count in ONE job via the Observation API — r1's
    * write→re-read→count pattern spent a full extra scan per stage, pure
    * fixed latency across the 15-stage chain (the dominant term in the
    * measured Amdahl decomposition, BENCH/BASELINE.md). `metric` defaults
    * to a plain row count; stages that count a predicate (e.g. non-empty
    * extractions) pass their own aggregate.
    */
  def writeCounted(table: String, df: DataFrame, partitions: Option[Int] = None,
      metric: Column = count(lit(1))): Long = {
    val obs = org.apache.spark.sql.Observation()
    val out = partitions.map(n => df.repartition(n)).getOrElse(df)
      .observe(obs, metric.cast("long").as("rows"))
    out.write.mode(SaveMode.Overwrite).parquet(path(table))
    obs.get("rows").asInstanceOf[Long]
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  /** S5 — batched MERGE-by-PK upsert, the row-level analogue of the
    * reference's TigerGraph vertex upsert (`util.upsert_vertex`,
    * `ecc/app/graphrag/workers.py:209-217`): rows with a new PK are
    * inserted, rows with an existing PK are updated, and columns listed in
    * `setUnionCols` merge with SET semantics (sorted distinct union — the
    * TigerGraph SET<STRING> attribute accumulate on Entity.description,
    * `SupportAI_Schema.gsql:21`). Swap-in is atomic at the directory level
    * (write to a staging path, then rename over the table), the same
    * commit granularity Iceberg's replace gives; with a real Iceberg
    * runtime this maps 1:1 onto MERGE INTO.
    *
    * This is what makes true INCREMENTAL runs possible: the epoch re-scan
    * model (`graph_rag.py:145-207`) re-extracts only new documents and
    * merges their entities/edges into the standing tables instead of
    * recomputing every stage.
    */
  def merge(table: String, updates: DataFrame, pk: Seq[String],
      setUnionCols: Seq[String] = Nil): Unit = {
    require(pk.nonEmpty, "merge needs at least one PK column")
    if (!exists(table)) { write(table, updates); return }
    val cur = read(table)
    val dataCols = updates.columns.filterNot(pk.contains)
    val merged = cur.as("o").join(updates.as("n"), pk, "full_outer")
      .select(
        pk.map(col) ++
          dataCols.map { c =>
            if (setUnionCols.contains(c))
              when(col(s"o.$c").isNull, col(s"n.$c"))
                .when(col(s"n.$c").isNull, col(s"o.$c"))
                .otherwise(array_sort(array_distinct(concat(col(s"o.$c"), col(s"n.$c")))))
                .as(c)
            else coalesce(col(s"n.$c"), col(s"o.$c")).as(c)
          }: _*)
    val staging = path(s"$table._staging")
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path(table))
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
  }

  def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  // ------------------------------------------------------------- lineage

  private def lineagePath = s"$root/_lineage"

  def appendLineage(row: LineageRow): Unit = {
    import spark.implicits._
    Seq(row).toDS().toDF().coalesce(1)
      .write.mode(SaveMode.Append).parquet(lineagePath)
  }

  def lineage(): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(lineagePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(lineagePath)
    else spark.emptyDataset[LineageRow](org.apache.spark.sql.Encoders.product[LineageRow]).toDF()
  }

  /** A stage is resumable-skippable iff its table committed (_SUCCESS) AND a
    * lineage row recorded the SAME input fingerprint — a changed config or
    * upstream output invalidates the stage (SURVEY.md §3.2 Spark lifecycle).
    */
  def isComplete(stage: String, fingerprint: String): Boolean =
    exists(stage) && {
      import spark.implicits._
      lineage()
        .where(col("stage") === stage && col("input_fingerprint") === fingerprint)
        .limit(1).count() > 0
    }
}

object Catalog {
  /** Run one stage with lineage + resume. `build` must WRITE table `stage`
    * via the catalog before returning.
    */
  def stage(cat: Catalog, runId: String, stageName: String, fingerprint: String, resume: Boolean)(
      build: => Long): StageResult = {
    if (resume && cat.isComplete(stageName, fingerprint)) {
      StageResult(stageName, skipped = true, rows = -1L, wallMs = 0L)
    } else {
      val t0 = System.nanoTime()
      val rows = build
      val wallMs = (System.nanoTime() - t0) / 1000000L
      cat.appendLineage(LineageRow(runId, stageName, fingerprint, rows, wallMs,
        new Timestamp(System.currentTimeMillis())))
      StageResult(stageName, skipped = false, rows = rows, wallMs = wallMs)
    }
  }
}

final case class StageResult(stage: String, skipped: Boolean, rows: Long, wallMs: Long)
