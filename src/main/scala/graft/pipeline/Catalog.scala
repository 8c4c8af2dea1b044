package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  def read(table: String): DataFrame = spark.read.parquet(path(table))

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
