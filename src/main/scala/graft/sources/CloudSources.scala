package graft.sources

import org.apache.spark.sql.SparkSession

/** S3 — cloud data-source creation (reference
  * `graphrag/app/supportai/supportai.py:150-245`): per-provider credential
  * VALIDATION (exact required-field checks and error messages) and the
  * connector-config mapping, re-targeted from TigerGraph's data-stream
  * connector JSON onto the Hadoop filesystem properties Spark's file
  * sources read (hadoop-aws `fs.s3a.*`, hadoop-azure `fs.azure.*` /
  * `abfss`, the GCS connector `fs.gs.*` — all public connector config
  * surfaces). The zero-egress sandbox cannot exercise the network half, so
  * the tested semantics end at "the right properties, derived by the
  * reference's rules, reach the Hadoop configuration the read path uses";
  * the mapping is also returned so callers can scope it per-read via
  * `spark.read.options(...)` instead of mutating session state.
  *
  * Like the reference, the created source gets a unique name
  * `SupportAI_<graph>_<id>` (`supportai.py:159-161`); the id is injectable
  * so tests stay deterministic (the reference uses uuid4).
  */
object CloudSources {

  final case class Created(
      dataSource: String,
      sourceId: String,
      dataPath: String,
      /** the connector properties, keyed for Hadoop conf / read options */
      properties: Map[String, String])

  /** Validate + map one data-source request. `apply` into the session's
    * Hadoop conf only when `applyToSession` (per-read options are the
    * scale-safe default — two jobs reading two buckets must not fight over
    * one global conf).
    */
  def create(spark: SparkSession, dataSource: String,
      config: Map[String, String], graphname: String = "graft",
      idSuffix: Option[String] = None,
      applyToSession: Boolean = false): Created = {
    val ds = dataSource.toLowerCase
    val props: Map[String, String] = ds match {
      case "s3" =>
        // `supportai.py:166-177` — both keys mandatory, one shared message
        if (!config.contains("aws_access_key") || !config.contains("aws_secret_key"))
          throw new IllegalArgumentException("AWS credentials not provided")
        Map(
          "fs.s3a.access.key" -> config("aws_access_key"),
          "fs.s3a.secret.key" -> config("aws_secret_key"))
      case "azure" =>
        // `supportai.py:183-205` — account key, OR the full OAuth triple
        if (config.contains("account_key"))
          Map("fs.azure.account.key" -> config("account_key"))
        else if (config.contains("client_id")) {
          if (!config.contains("client_secret"))
            throw new IllegalArgumentException("Client secret not provided")
          if (!config.contains("tenant_id"))
            throw new IllegalArgumentException("Tenant id not provided")
          Map(
            "fs.azure.account.auth.type" -> "OAuth",
            "fs.azure.account.oauth.provider.type" ->
              "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider",
            "fs.azure.account.oauth2.client.id" -> config("client_id"),
            "fs.azure.account.oauth2.client.secret" -> config("client_secret"),
            "fs.azure.account.oauth2.client.endpoint" ->
              s"https://login.microsoftonline.com/${config("tenant_id")}/oauth2/token")
        } else throw new IllegalArgumentException("Azure credentials not provided")
      case "gcs" =>
        // `supportai.py:207-228` — four mandatory fields, field-specific errors
        if (!config.contains("project_id"))
          throw new IllegalArgumentException("Project id not provided")
        if (!config.contains("private_key_id"))
          throw new IllegalArgumentException("Private key id not provided")
        if (!config.contains("private_key"))
          throw new IllegalArgumentException("Private key not provided")
        if (!config.contains("client_email"))
          throw new IllegalArgumentException("Client email not provided")
        Map(
          "fs.gs.project.id" -> config("project_id"),
          "fs.gs.auth.service.account.enable" -> "true",
          "fs.gs.auth.service.account.private.key.id" -> config("private_key_id"),
          "fs.gs.auth.service.account.private.key" -> config("private_key"),
          "fs.gs.auth.service.account.email" -> config("client_email"))
      case "local" => Map.empty // `supportai.py:229-230` — nothing to configure
      case _ => throw new IllegalArgumentException("Data source not implemented")
    }
    if (applyToSession)
      props.foreach { case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v) }
    val id = idSuffix.getOrElse(java.util.UUID.randomUUID().toString.replace("-", ""))
    Created(
      dataSource = ds,
      sourceId = if (ds == "local") "DocumentContent" // `supportai.py:242-243`
                 else s"SupportAI_${graphname}_$id",
      dataPath = config.getOrElse("data_path", ""),
      properties = props)
  }
}
