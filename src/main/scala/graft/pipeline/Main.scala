package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusSynth
import graft.resolve.Resolution

/** spark-submit entry point for the KG-construction pipeline (SURVEY.md §7.1).
  *
  * Usage (also runnable via `sbt "runMain graft.pipeline.Main ..."`):
  *   graft.pipeline.Main --out DIR [--pages N] [--clusters N] [--cores N]
  *     [--resume] [--run-id ID] [--dim N] [--chunker regex|character]
  *     [--bucketed] [--incremental N]
  *
  * `--bucketed` writes the MERGE-target tables in the `_bucket=K` PK-hash
  * layout, making later incremental commits O(delta). `--incremental N`
  * drives the reference's actual operating mode (the ECC re-scan loop,
  * `graph_rag.py:145-207`): it appends the NEXT N synthesized crawl pages
  * to an existing `--out` dir via `Pipeline.runIncremental` — extraction
  * touches only the delta, standing tables end identical to a full run
  * over the union (PipelineSpec asserts hash equality). Pass the SAME
  * --pages/--clusters as the base run (they name the base corpus).
  *
  * Prints a per-stage summary (rows, wall ms, skipped) and a sample of
  * resolved triples — the observable surface of the whole flow.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val out = opts.getOrElse("out", sys.error("--out DIR is required"))
    val pages = opts.getOrElse("pages", "200").toInt
    val clusters = opts.getOrElse("clusters", math.max(8, pages / 10).toString).toInt
    val cores = opts.getOrElse("cores", "4")
    val dim = opts.getOrElse("dim", "1536").toInt
    val runId = opts.getOrElse("run-id", s"run-${pages}p")
    val resume = opts.contains("resume")
    val chunker = opts.getOrElse("chunker", "regex")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cores]"))
      .appName("graft-kg-pipeline")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val incrN = opts.get("incremental").map(_.toInt)
    val cfg = Pipeline.Config(
      corpus = CorpusSynth.Config(nPages = pages, nClusters = clusters),
      chunkerType = chunker,
      er = Resolution.Params(dim = dim),
      outDir = out, runId = runId, resume = resume,
      incrementalLayout = opts.contains("bucketed"))

    val t0 = System.nanoTime()
    val result = incrN match {
      case Some(n) =>
        val unionCorpus = cfg.corpus.copy(nPages = pages + n)
        val newBatch = CorpusSynth.pagesRange(spark, unionCorpus, pages, pages + n)
        Pipeline.runIncremental(
          spark, cfg.copy(runId = opts.getOrElse("run-id", s"delta-${pages}p+$n")), newBatch)
      case None => Pipeline.run(spark, cfg)
    }
    val wallS = (System.nanoTime() - t0) / 1e9

    println(f"%nstage summary (run=$runId pages=$pages clusters=$clusters):")
    result.stages.foreach { s =>
      val state = if (s.skipped) "SKIPPED" else f"${s.rows}%8d rows ${s.wallMs}%6d ms"
      println(f"  ${s.stage}%-20s $state")
    }
    val triples = result.resolvedTriples
    val n = triples.count()
    println(f"%nresolved triples: $n (total wall ${wallS}%.1f s)")
    println("sample:")
    triples.orderBy("subj", "pred", "obj").limit(10).collect()
      .foreach(t => println(s"  (${t.subj}, ${t.pred}, ${t.obj})"))
    spark.stop()
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case "--resume" :: rest => parse(rest, acc + ("resume" -> "true"))
      case "--bucketed" :: rest => parse(rest, acc + ("bucketed" -> "true"))
      case k :: v :: rest if k.startsWith("--") => parse(rest, acc + (k.drop(2) -> v))
      case other :: _ => sys.error(s"unrecognized argument: $other")
    }
}
