package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion sources — SURVEY.md §2.1 (S1, S2, S4).
  *
  * The reference loads documents three ways: a JSONL loading job, a
  * `|`-separated CSV loading job, and a blob-store batch reader; all map into
  * `Document(doc_id, text)` with the doc id LOWERCASED at load
  * (`common/gsql/supportai/SupportAI_InitialLoadJSON.gsql:1-7`,
  * `SupportAI_InitialLoadCSV.gsql:1-6`,
  * `graphrag/app/supportai/supportai_ingest.py:404-449`). Epoch stamping
  * (`epoch_added = now()`) becomes an `ingested_at` column; in tests a fixed
  * clock keeps outputs deterministic.
  *
  * Scale: all three are plain distributed scans; schema is declared, never
  * inferred (schema inference would double-read 100 TB).
  */
object Ingest {

  import org.apache.spark.sql.types._

  /** The reference's loading-job field set (templated per request in
    * `graphrag/app/supportai/supportai.py:119-151`).
    */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("content", StringType, nullable = true),
    StructField("doc_type", StringType, nullable = true)))

  private def normalize(df: DataFrame, clock: Option[java.sql.Timestamp]): DataFrame =
    df.select(
      lower(col("doc_id")).as("doc_id"), // gsql_lower at load (S1 :3)
      coalesce(col("content"), lit("")).as("text"),
      coalesce(col("doc_type"), lit("")).as("doc_type"),
      clock.map(lit(_)).getOrElse(current_timestamp()).as("ingested_at"))

  /** S1: JSONL → documents. */
  def loadJson(spark: SparkSession, path: String,
      clock: Option[java.sql.Timestamp] = None): DataFrame =
    normalize(spark.read.schema(DocSchema).json(path), clock)

  /** S2: `|`-separated CSV with header and double-quote quoting → documents
    * (`SupportAI_InitialLoadCSV.gsql:1-6`: SEPARATOR="|", HEADER="true",
    * QUOTE="double").
    */
  def loadCsv(spark: SparkSession, path: String,
      clock: Option[java.sql.Timestamp] = None): DataFrame =
    normalize(
      spark.read.schema(DocSchema)
        .option("sep", "|").option("header", "true").option("quote", "\"")
        .csv(path),
      clock)

  /** S4: blob/object-store batch read — one document per file, doc_id = the
    * file name (lowercased), like the reference's S3/ABS/GCS batch ingest.
    * `wholetext` keeps one row per object; at scale prefer many small-ish
    * objects over few huge ones (a 10 GB object becomes one task).
    */
  def loadBlobText(spark: SparkSession, glob: String,
      clock: Option[java.sql.Timestamp] = None): DataFrame =
    spark.read.option("wholetext", "true").text(glob)
      .select(
        lower(regexp_extract(input_file_name(), "([^/]+)$", 1)).as("doc_id"),
        col("value").as("text"),
        lit("").as("doc_type"),
        clock.map(lit(_)).getOrElse(current_timestamp()).as("ingested_at"))
}
