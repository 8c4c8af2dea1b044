package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusSynth

/** spark-submit entry point for the curation pipeline ([[Curate]]).
  *
  * Usage (also runnable via `sbt "runMain graft.pipeline.CurateMain ..."`):
  *   graft.pipeline.CurateMain --out DIR [--pages N] [--clusters N]
  *     [--cores N] [--resume] [--run-id ID] [--min-tokens N]
  *     [--jaccard X] [--target-pct N] [--pack-budget N] [--incremental N]
  *
  * `--incremental N` ingests the NEXT N synthesized crawl pages into an
  * existing `--out` catalog via [[Curate.runIncremental]] — every dedup
  * gate probes standing history state (url index, content Bloom, LSH band
  * index, bench grams) in O(batch); pass the same --pages/--clusters as
  * the base run.
  *
  * Prints the per-stage funnel (rows, wall ms, skipped) and the final
  * corpus/pack counts — the observable surface of the whole flow.
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val out = opts.getOrElse("out", sys.error("--out DIR is required"))
    val pages = opts.getOrElse("pages", "200").toInt
    val clusters = opts.getOrElse("clusters", math.max(8, pages / 10).toString).toInt
    val cores = opts.getOrElse("cores", "4")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cores]"))
      .appName("graft-curate-pipeline")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = Curate.Config(
      corpus = CorpusSynth.Config(nPages = pages, nClusters = clusters),
      outDir = out,
      runId = opts.getOrElse("run-id", s"curate-${pages}p"),
      resume = opts.contains("resume"),
      minTokens = opts.getOrElse("min-tokens", "10").toLong,
      jaccard = opts.getOrElse("jaccard", "0.5").toDouble,
      targetPct = opts.getOrElse("target-pct", "60").toInt,
      packBudgetTokens = opts.getOrElse("pack-budget", "2048").toLong)

    val t0 = System.nanoTime()
    val result = opts.get("incremental").map(_.toInt) match {
      case Some(n) =>
        val batch = CorpusSynth
          .pagesRange(spark, cfg.corpus.copy(nPages = pages + n), pages, pages + n)
          .select(org.apache.spark.sql.functions.col("url"),
            org.apache.spark.sql.functions.col("lang"),
            org.apache.spark.sql.functions.col("text"))
        Curate.runIncremental(spark,
          cfg.copy(runId = s"${cfg.runId}-incr$n"), batch)
      case None => Curate.run(spark, cfg)
    }
    val wall = (System.nanoTime() - t0) / 1e9

    println(s"stage summary (run=${cfg.runId} pages=$pages clusters=$clusters):")
    result.stages.foreach { s =>
      val status = if (s.skipped) "SKIPPED" else f"${s.rows}%8d rows ${s.wallMs}%6d ms"
      println(f"  ${s.stage}%-18s $status")
    }
    val fin = result.finalDocs.count()
    println(f"final corpus: $fin docs (total wall $wall%.1f s)")
    spark.stop()
  }

  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--resume" :: rest => parse(rest, acc + ("resume" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parse(rest, acc + (flag.drop(2) -> value))
      case other :: _ => sys.error(s"unrecognized argument: $other")
    }
}
