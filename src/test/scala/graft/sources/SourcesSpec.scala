package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Lifecycle

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val clock = Some(Timestamp.valueOf("2025-01-01 00:00:00"))

  test("loadJson lowercases doc ids and fills missing fields") {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("d.jsonl"),
      """{"doc_id":"DOC-A","content":"Alpha text","doc_type":"txt"}
        |{"doc_id":"Doc-B","content":"Beta"}
        |""".stripMargin)
    val out = Ingest.loadJson(spark, dir.toString, clock)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("doc-a", "doc-b"))
    assert(out(1).getString(2) == "") // missing doc_type -> ""
    assert(out(0).getTimestamp(3) == clock.get)
  }

  test("loadCsv reads pipe-separated with header") {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("d.csv"),
      "doc_id|content|doc_type\nUPPER-1|\"text with | pipe\"|txt\n")
    val out = Ingest.loadCsv(spark, dir.toString, clock).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "upper-1")
    assert(out(0).getString(1) == "text with | pipe")
  }

  test("loadBlobText: one doc per file, id from filename") {
    val dir = Files.createTempDirectory("graft-blob")
    Files.writeString(dir.resolve("Page-One.txt"), "line a\nline b")
    Files.writeString(dir.resolve("other.txt"), "solo")
    val out = Ingest.loadBlobText(spark, dir.toString + "/*.txt", clock)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("other.txt", "page-one.txt"))
    assert(out(1).getString(1) == "line a\nline b")
  }

  test("modHashBatch partitions rows disjointly and completely") {
    val df = (0 until 100).map(i => s"id$i").toDF("id")
    val n = 7
    val batches = (0 until n).map(b =>
      Lifecycle.modHashBatch(df, "id", n, b).as[String].collect().toSet)
    assert(batches.map(_.size).sum == 100)
    assert(batches.reduce(_ union _).size == 100)
  }

  test("scanForUpdates picks fresh-or-expired by priority with limit") {
    val t0 = Timestamp.valueOf("2025-01-01 00:00:00")
    def ts(h: Int) = Timestamp.valueOf(f"2025-01-01 $h%02d:00:00")
    val df = Seq(
      ("a", ts(1), null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp]),
      ("b", ts(0), null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp]),
      ("c", ts(2), null.asInstanceOf[Timestamp], ts(3)), // processed
      ("d", ts(3), ts(4), null.asInstanceOf[Timestamp])) // in-flight (recent? expired by 2026 now)
      .toDF("doc_id", "ingested_at", "processing_at", "processed_at")
    val out = Lifecycle.scanForUpdates(df, 2).select("doc_id").as[String].collect().toSeq
    assert(out == Seq("b", "a")) // priority by ingested_at, c excluded
  }

  test("status counts lifecycle states") {
    val t = Timestamp.valueOf("2025-01-01 00:00:00")
    val df = Seq(
      ("a", null.asInstanceOf[Timestamp], null.asInstanceOf[Timestamp]),
      ("b", t, null.asInstanceOf[Timestamp]),
      ("c", t, t))
      .toDF("doc_id", "processing_at", "processed_at")
    val m = Lifecycle.status(df).as[(String, Long)].collect().toMap
    assert(m == Map("fresh" -> 1L, "processing" -> 1L, "processed" -> 1L))
  }

  test("nonexistent = anti join") {
    val cand = Seq("a", "b", "x").toDF("id")
    val existing = Seq("a", "b", "c").toDF("id")
    assert(Lifecycle.nonexistent(cand, existing, "id").as[String].collect().toSeq == Seq("x"))
  }

  test("cloud data-source creation: validation parity and connector mapping") {
    import graft.sources.CloudSources
    // s3: both keys mandatory, one shared error message (supportai.py:166-171)
    val s3 = CloudSources.create(spark, "S3",
      Map("aws_access_key" -> "AK", "aws_secret_key" -> "SK", "data_path" -> "s3a://b/p"),
      graphname = "g", idSuffix = Some("t1"))
    assert(s3.properties == Map("fs.s3a.access.key" -> "AK", "fs.s3a.secret.key" -> "SK"))
    assert(s3.sourceId == "SupportAI_g_t1" && s3.dataPath == "s3a://b/p")
    val e1 = intercept[IllegalArgumentException] {
      CloudSources.create(spark, "s3", Map("aws_access_key" -> "AK"))
    }
    assert(e1.getMessage == "AWS credentials not provided")
    // azure: account key path, else the full OAuth triple with field errors
    val abs = CloudSources.create(spark, "azure", Map("account_key" -> "K"), idSuffix = Some("t"))
    assert(abs.properties == Map("fs.azure.account.key" -> "K"))
    assert(intercept[IllegalArgumentException] {
      CloudSources.create(spark, "azure", Map("client_id" -> "c"))
    }.getMessage == "Client secret not provided")
    assert(intercept[IllegalArgumentException] {
      CloudSources.create(spark, "azure", Map("client_id" -> "c", "client_secret" -> "s"))
    }.getMessage == "Tenant id not provided")
    assert(intercept[IllegalArgumentException] {
      CloudSources.create(spark, "azure", Map.empty)
    }.getMessage == "Azure credentials not provided")
    val oauth = CloudSources.create(spark, "azure",
      Map("client_id" -> "c", "client_secret" -> "s", "tenant_id" -> "T"), idSuffix = Some("t"))
    assert(oauth.properties("fs.azure.account.oauth2.client.endpoint")
      == "https://login.microsoftonline.com/T/oauth2/token")
    // gcs: four mandatory fields, field-specific messages (supportai.py:207-218)
    assert(intercept[IllegalArgumentException] {
      CloudSources.create(spark, "gcs", Map.empty)
    }.getMessage == "Project id not provided")
    val gcs = CloudSources.create(spark, "gcs", Map("project_id" -> "p",
      "private_key_id" -> "kid", "private_key" -> "key", "client_email" -> "e@x"),
      idSuffix = Some("t"))
    assert(gcs.properties("fs.gs.auth.service.account.email") == "e@x")
    // local: no properties, fixed source id (supportai.py:242-243)
    val local = CloudSources.create(spark, "LOCAL", Map.empty)
    assert(local.properties.isEmpty && local.sourceId == "DocumentContent")
    // unknown source: reference error text (supportai.py:232)
    assert(intercept[IllegalArgumentException] {
      CloudSources.create(spark, "ftp", Map.empty)
    }.getMessage == "Data source not implemented")
    // applyToSession pushes properties into the Hadoop conf the readers use
    CloudSources.create(spark, "s3", Map("aws_access_key" -> "A2",
      "aws_secret_key" -> "S2"), applyToSession = true)
    assert(spark.sparkContext.hadoopConfiguration.get("fs.s3a.access.key") == "A2")
  }
}
