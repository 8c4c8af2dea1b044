package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.CorpusSynth
import graft.operators.{Curation, Dedup, TextStats, WebCuration}
import graft.resolve.Resolution

/** Training-data curation pipeline — the web-corpus counterpart of
  * [[Pipeline]]: raw crawl pages in, a packed, deduplicated,
  * decontaminated, mixture-balanced corpus out, with the same
  * fingerprint-chained per-stage lineage, `--resume`, and per-partition
  * file metrics. Every stage is one of the already-oracle-checked
  * operators; this driver contributes ordering, the funnel lineage, and
  * the standing tables.
  *
  * Funnel (the RefinedWeb stage order; each stage reads the previous
  * stage's table):
  *   raw pages (+ synthesized recrawl/mirror/cache duplicates and a
  *   boilerplate line — the dirt each stage exists to remove) → docs
  *   (id=lower(url)) → URL dedup (canonicalized URL, min-id survivor;
  *   collapses the tracking-param recrawls) → PII redaction → exact
  *   content dedup (collapses the mirrors) → cross-doc line dedup
  *   (strips the boilerplate chrome) → quality gate → MinHash near-dup
  *   clusters + per-cluster survivor pick (collapses the perturbed cache
  *   copies) → eval-set decontamination → temperature mixture sampling
  *   (per-lang) → contiguous packs.
  *
  * Scale shape: the corpus-sized stages are narrow maps or single
  * bounded-key shuffles (url_norm, line content, content digest, LSH band
  * buckets, lang); the decision tables that drive filters (URL groups,
  * dup clusters, rate table) are the SMALL side and broadcast. Nothing
  * collects the corpus to the driver.
  */
object Curate {

  final case class Config(
      corpus: CorpusSynth.Config = CorpusSynth.Config(),
      outDir: String = "/tmp/graft-curate",
      runId: String = "curate-0",
      resume: Boolean = false,
      /** quality gate: minimum whitespace tokens after line dedup. */
      minTokens: Long = 10,
      /** near-dup exact-Jaccard verify threshold (MinHash banding above). */
      jaccard: Double = 0.5,
      /** synthesize web dirt: ~5% tracking-param recrawls, ~5% exact
        * mirrors, ~5% perturbed cache copies, boilerplate lines — so the
        * funnel's dedup stages have real prey in a test corpus. Off for
        * real (pre-dirtied) inputs.
        */
      injectDups: Boolean = true,
      /** line-dedup tolerance: lines shared by MORE than this many docs are
        * boilerplate chrome. 2 tolerates pairwise original/cache overlap
        * ahead of the fuzzy-dedup stage that collapses those pairs.
        */
      lineDedupMaxDocs: Int = 2,
      /** eval slice: docs whose FNV bucket (of `evalMod`) is 0 form the
        * held-out benchmark; n-gram hits against it are dropped from train.
        */
      evalMod: Int = 97,
      decontamN: Int = 8,
      /** mixture target as parts-per-hundred of the post-decontam corpus. */
      targetPct: Int = 60,
      packBudgetTokens: Long = 2048,
      shufflePartitions: Option[Int] = None) {
    def fingerprintBase: String =
      s"curate|$corpus|$minTokens|$jaccard|$injectDups|$lineDedupMaxDocs|" +
        s"$evalMod|$decontamN|$targetPct|$packBudgetTokens"
  }

  final case class Result(catalog: Catalog, stages: Seq[StageResult]) {
    def finalDocs: DataFrame = catalog.read("cur_final")
  }

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .take(12).map("%02x".format(_)).mkString

  def run(spark: SparkSession, cfg: Config): Result = {
    val cat = new Catalog(cfg.outDir, spark)
    val results = Vector.newBuilder[StageResult]
    var upstream = sha(cfg.fingerprintBase)

    def stage(name: String)(build: Catalog => Long): Unit = {
      upstream = sha(s"$upstream/$name")
      results += Catalog.stage(cat, cfg.runId, name, upstream, cfg.resume)(build(cat))
    }

    stage("cur_docs") { c =>
      val base = CorpusSynth.pages(spark, cfg.corpus).toDF()
        .select(col("url"), col("lang"), col("text"))
      val all = if (!cfg.injectDups) base else {
        // deterministic web dirt, keyed on the url hash so re-runs and
        // partitionings agree; the boilerplate line lands on >2 docs so
        // the line-dedup threshold classifies it as chrome
        val bucket = Curation.hashBucketCol(col("url"), 20)
        val chrome = lit("\nsubscribe to our newsletter for updates and offers")
        val recrawls = base.where(bucket === 0).select(
          concat(col("url"), lit("?utm_source=feed")).as("url"),
          col("lang"), col("text"))
        val mirrors = base.where(bucket === 1).select(
          regexp_replace(col("url"), "://", "://mirror.").as("url"),
          col("lang"), col("text"))
        val caches = base.where(bucket === 2).select(
          regexp_replace(col("url"), "://", "://cache.").as("url"),
          col("lang"),
          concat(col("text"), lit(" archived snapshot"), chrome).as("text"))
        val chromed = base.where(bucket === 3).select(
          col("url"), col("lang"), concat(col("text"), chrome).as("text"))
        base.where(bucket =!= 3).unionByName(chromed)
          .unionByName(recrawls).unionByName(mirrors).unionByName(caches)
      }
      c.writeCounted("cur_docs",
        all.select(lower(col("url")).as("doc_id"), col("url"), col("lang"), col("text")),
        cfg.shufflePartitions)
    }

    // one survivor per canonicalized URL (tracking params / fragments /
    // scheme-case collapse), min doc_id — recrawls and utm-variants go here
    stage("cur_url_dedup") { c =>
      val docs = c.read("cur_docs")
        .withColumn("url_norm", WebCuration.normalizeUrlCol(col("url")))
      val w = Window.partitionBy(col("url_norm")).orderBy(col("doc_id"))
      c.writeCounted("cur_url_dedup",
        docs.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("doc_id"), col("url_norm"), col("lang"), col("text")))
    }

    stage("cur_pii") { c =>
      val docs = c.read("cur_url_dedup")
      c.writeCounted("cur_pii",
        WebCuration.redactPii(docs)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("n_emails"), col("n_phones"),
            col("n_ips"), col("text_redacted").as("text")))
    }

    // exact content dedup BEFORE line dedup: byte-identical mirrors must
    // collapse to one copy before shared lines could read as boilerplate
    stage("cur_exact_dedup") { c =>
      c.writeCounted("cur_exact_dedup",
        Dedup.exactDedup(c.read("cur_pii"))
          .select(col("doc_id"), col("lang"), col("text")))
    }

    // cross-document line dedup (boilerplate chrome); fully-boilerplate
    // docs drop out at the empty-text filter
    stage("cur_line_dedup") { c =>
      val docs = c.read("cur_exact_dedup")
      c.writeCounted("cur_line_dedup",
        Curation.dedupLines(docs, maxDupDocs = cfg.lineDedupMaxDocs)
          .where(col("n_lines_kept") > 0)
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .select(col("doc_id"), col("lang"), col("text_clean").as("text")))
    }

    stage("cur_quality") { c =>
      c.writeCounted("cur_quality",
        TextStats.qualityMetrics(c.read("cur_line_dedup"), minTokens = cfg.minTokens)
          .where(col("quality_ok"))
          .select(col("doc_id"), col("lang"), col("text")))
    }

    // MinHash banding → exact-Jaccard verify → connected components →
    // per-cluster survivor (argmax tokens, ties to min id)
    stage("cur_near_dedup") { c =>
      val docs = c.read("cur_quality")
      val pairs = Dedup.minhashPairs(docs,
        Dedup.MinHashParams(jaccardThreshold = cfg.jaccard)).localCheckpoint(true)
      val ids = pairs.select(col("a").as("entity_id"))
        .unionByName(pairs.select(col("b").as("entity_id"))).distinct()
      val clusters = Resolution.connectedComponents(ids,
          pairs.select(col("a").as("src"), col("b").as("dst")))
        .select(col("entity_id").as("doc_id"), col("component_id").as("cluster_id"))
      val decision = Dedup.canonicalDocs(docs, clusters,
        TextStats.tokenCountCol(col("text")))
      c.writeCounted("cur_near_dedup",
        docs.join(decision.where(col("kept")).select(col("doc_id")), "doc_id")
          .select(col("doc_id"), col("lang"), col("text")))
    }

    // the held-out eval slice leaves the corpus entirely; any surviving
    // train doc sharing an n-gram with it is contamination and drops too
    stage("cur_decontam") { c =>
      val docs = c.read("cur_near_dedup")
      val isEval = Curation.hashBucketCol(col("doc_id"), cfg.evalMod) === 0
      val train = docs.where(!isEval)
      val bench = docs.where(isEval)
      val hits = Curation.decontaminate(train, bench, n = cfg.decontamN)
      c.writeCounted("cur_decontam",
        train.join(hits.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("lang"), col("text")))
    }

    stage("cur_mixture") { c =>
      val docs = c.read("cur_decontam")
      val target = docs.count() * cfg.targetPct / 100
      val rates = Curation.temperatureRates(docs, "lang", target)
      c.writeCounted("cur_rates", rates)
      c.writeCounted("cur_mixture",
        Curation.temperatureSample(docs, rates, "lang", "doc_id")
          .select(col("doc_id"), col("lang"), col("text")))
    }

    stage("cur_packs") { c =>
      c.writeCounted("cur_packs",
        Curation.packContiguous(c.read("cur_mixture"), "lang", "doc_id", "text",
          cfg.packBudgetTokens))
    }

    stage("cur_final") { c =>
      c.writeCounted("cur_final", c.read("cur_mixture"))
    }

    Result(cat, results.result())
  }
}
