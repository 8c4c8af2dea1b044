package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusSynth

/** Per-round benchmark — one JSON line on stdout.
  *
  * Two measurements (BASELINE.md method):
  *   1. KG-construction throughput (triples/sec): the full in-memory stage
  *      graph (synth → chunk → extract → assemble → resolve → lift) on the
  *      sf-scaled corpus, run at TWO parallelism levels — local[N/4] then
  *      local[N] with shuffle partitions scaled and AQE on — the sandbox
  *      proxy for the north rule's N vs 4N executors. Scaling efficiency =
  *      (T_low / T_high) / (cores_high / cores_low), target ≥ 0.8.
  *   2. Headline query timings over the driver's sf tables at local[N]
  *      (count() forces full execution; inputs are parquet scans).
  *
  * Adjudication instrumentation (r2 verdict: a 2.6× wall gap between two
  * best-of-2 runs of the SAME commit was unresolvable from the artifacts):
  *   - every sample's wall AND the host's /proc/stat steal-time delta are
  *     recorded, so host contention is measured per sample, not argued;
  *   - a per-stage wall breakdown (plans.BenchProfile) is embedded;
  *   - every run is archived to BENCH/runs/<utc>-<git-sha>.json (last_run
  *     .json stays the latest copy) — run history survives across rounds.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      // single shared JVM ⇒ one copy of the ER scoring map; inert at the
      // 300k operating point (map ≈ 216 MB < the 256 MB default), lets
      // SPARK_GRAFT_KG_PAGES sweeps past ~43k entities stay map-side
      .config("spark.graft.er.maxBroadcastBytes", (2L << 30).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Host steal-time ticks (/proc/stat cpu line, field 8) — time the
    * hypervisor ran someone else while this guest was runnable. Divides by
    * USER_HZ=100 to seconds. 0 when unreadable (non-Linux).
    */
  private def stealTicks(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = line.trim.split("\\s+")
      if (f.length > 8) f(8).toLong else 0L
    } catch { case _: Throwable => 0L }

  /** Cumulative stop-the-world GC milliseconds across all collectors of
    * this JVM (driver = executor under local[*], so this IS the job's GC).
    */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Resident set size in MB (/proc/self/status VmRSS); 0 if unreadable. */
  private def rssMb(): Long =
    try {
      scala.io.Source.fromFile("/proc/self/status").getLines()
        .find(_.startsWith("VmRSS"))
        .map(_.split("\\s+")(1).toLong / 1024).getOrElse(0L)
    } catch { case _: Throwable => 0L }

  /** One KG sample with the r3-verdict adjudication fields: ordinal (JIT
    * warmup position), per-sample GC ms and end-of-run RSS — the r3 bench
    * had a 3.4x sample at near-zero steal that NO recorded field could
    * explain; wall variance must be attributable from the artifact alone.
    */
  final case class Sample(ordinal: Int, wall: Double, stealSec: Double,
      gcMs: Long, rssMb: Long)

  /** Full KG construction; returns (resolvedTripleCount, sample). */
  private def runKg(cores: Int, cfg: CorpusSynth.Config, ordinal: Int): (Long, Sample) = {
    val spark = session(cores)
    val s0 = stealTicks()
    val g0 = gcMillis()
    val t0 = System.nanoTime()
    val n = SparkEntry.KgStages(spark, cfg).resolvedTriples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val steal = (stealTicks() - s0) / 100.0
    val gc = gcMillis() - g0
    spark.stop()
    (n, Sample(ordinal, wall, steal, gc, rssMb()))
  }

  /** Full PIPELINE wall: the chain plus the Louvain community hierarchy —
    * the stage the headline historically excluded (r4 VERDICT: 67% of true
    * pipeline wall at 3M pages before the driver-side hierarchy finish).
    * Communities = Louvain.run forced via membership counts, the same
    * definition EnduranceBench attributes against. The chain-only series
    * above stays for r1-r4 history continuity; this group is the honest
    * user-facing number.
    */
  private def runKgFull(cores: Int, cfg: CorpusSynth.Config, ordinal: Int): (Long, Sample) = {
    val spark = session(cores)
    val s0 = stealTicks()
    val g0 = gcMillis()
    val t0 = System.nanoTime()
    val st = SparkEntry.KgStages(spark, cfg)
    val n = st.resolvedTriples.count()
    st.louvain.levels.foreach(_.membership.count())
    val wall = (System.nanoTime() - t0) / 1e9
    val steal = (stealTicks() - s0) / 100.0
    val gc = gcMillis() - g0
    spark.stop()
    (n, Sample(ordinal, wall, steal, gc, rssMb()))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val coresHigh = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val coresLow = math.max(1, coresHigh / 4)
    // 300k pages at the sf0.1 tier (r3: up from 150k). The r2 code hit a
    // memory-bandwidth knee at 300k (T32 69 s); the r3 plan fixes (sparse
    // signing, fused probe jobs, broadcast scoring) removed it — measured
    // clean-steal sweep at r3 HEAD: 150k → eff 0.41, 300k → 0.46,
    // 600k → 0.45 with T32 scaling near-linearly (13.5 → 20.7 → 39.0 s).
    // 300k amortizes the fixed per-job floor (F ≈ 11-15 s) twice as well
    // as 150k without stretching the driver's bench budget. A real
    // cluster shares neither single-box ceiling — see BENCH/BASELINE.md.
    val pages = sys.env.get("SPARK_GRAFT_KG_PAGES").map(_.toInt).getOrElse {
      if (sfDir.contains("0.001")) 2000
      else if (sfDir.contains("0.01")) 20000
      else 300000
    }
    val cfg = CorpusSynth.Config(nPages = pages, nClusters = math.max(12, pages / 25))

    // warm JIT/classloading so the low-parallelism run isn't penalized
    runKg(coresLow, cfg.copy(nPages = 200), ordinal = 0)

    // best-of-3 per level, interleaved (r4; r3 was best-of-2): the sandbox
    // VM shows multi-x steal-time swings (host contention), so few samples
    // per level can invert the scaling signal entirely. Per-sample steal,
    // GC ms, RSS and ordinal are recorded so a polluted sample is
    // attributable from the artifact, not argued.
    val (nLow, low1) = runKg(coresLow, cfg, 1)
    val (nHigh, high1) = runKg(coresHigh, cfg, 2)
    val (_, low2) = runKg(coresLow, cfg, 3)
    val (_, high2) = runKg(coresHigh, cfg, 4)
    val (_, low3) = runKg(coresLow, cfg, 5)
    val (_, high3) = runKg(coresHigh, cfg, 6)
    val lows = Seq(low1, low2, low3)
    val highs = Seq(high1, high2, high3)
    val wallLow = lows.map(_.wall).min
    val wallHigh = highs.map(_.wall).min
    val thrLow = nLow / wallLow
    val thrHigh = nHigh / wallHigh
    val eff = (thrHigh / thrLow) / (coresHigh.toDouble / coresLow)

    // kg_full (r5): chain + communities, interleaved best-of-2 per level —
    // the full-pipeline wall AND its own scaling efficiency alongside the
    // chain-only history series
    val (nFull, full1Low) = runKgFull(coresLow, cfg, 7)
    val (_, full1High) = runKgFull(coresHigh, cfg, 8)
    val (_, full2Low) = runKgFull(coresLow, cfg, 9)
    val (_, full2High) = runKgFull(coresHigh, cfg, 10)
    val fullLows = Seq(full1Low, full2Low)
    val fullHighs = Seq(full1High, full2High)
    val fullWallLow = fullLows.map(_.wall).min
    val fullWallHigh = fullHighs.map(_.wall).min
    val fullEff = ((nFull / fullWallHigh) / (nFull / fullWallLow)) /
      (coresHigh.toDouble / coresLow)

    // per-stage walls: one instrumented run at full parallelism (extra
    // checkpoints make the sum ≥ the headline wall — attribution only)
    val profSpark = session(coresHigh)
    val pt0 = System.nanoTime()
    val ps0 = stealTicks()
    val (_, stageWalls) = plans.BenchProfile.profile(profSpark, cfg)
    val profWall = (System.nanoTime() - pt0) / 1e9
    val profSteal = (stealTicks() - ps0) / 100.0
    profSpark.stop()

    // adversarial skew group (r4, VERDICT item 4): the same chain on a
    // web-Zipf corpus (cluster 0 hot in 20% of facts, one domain at 30%)
    // with per-stage task-time distributions — data here, hard guard in
    // plans.SkewBench's main (bench must not die on a host-steal spike)
    val skewSpark = session(coresHigh)
    val skewCfg = cfg.copy(nPages = pages / 2,
      nClusters = math.max(12, pages / 50),
      hotClusterFrac = 0.2, hotDomainFrac = 0.3)
    val (skewWall, skewTriples, skewRows) =
      plans.SkewBench.run(skewSpark, skewCfg, minTasks = 16, minMaxMs = 500L)
    skewSpark.stop()

    // headline queries at full parallelism
    val spark = session(coresHigh)
    val headline = Seq(
      "q_agg_pricing", "q_multi_join_revenue", "q_window_rank", "q_set_ops",
      "q_event_windows", "q_keyword_search", "q_token_count", "q_quality",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",
      "q_ann_bruteforce", "q_ann_ivf", "q_embed_neardup", "q_chunk_character")
    val qtimes = headline.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // curation-op timings, reported in their own group so the headline
    // `total` stays comparable across the r1-r3 run history
    val curation = Seq(
      "q_pii", "q_url_normalize", "q_url_dedup", "q_domain_stats",
      "q_bloom_dedup", "q_temperature_sample", "q_c4_clean",
      "q_substring_dup", "q_vocab_topk", "q_embed_centroids",
      "q_dedup_canonical", "q_bm25", "q_rrf_fusion", "q_lm_ppl_buckets",
      "q_ccnet_normalize", "q_domain_quota", "q_semdedup", "q_dsir_select",
      "q_shard_assign", "q_shard_manifest", "q_bpe_merges", "q_bpe_encode_gate",
      "q_asof_join", "q_range_join", "q_mg_topk_gate",
      "q_kmv_distinct", "q_kmv_overlap", "q_hopping_windows",
      "q_winnow", "q_winnow_pairs", "q_cooc_pairs", "q_cm_cells",
      "q_blocklist", "q_sq8", "q_rp", "q_lpa", "q_clustering",
      "q_weighted_sample", "q_zorder", "q_ppjoin", "q_containment")
    val ctimes = curation.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    val gitSha =
      try new String(java.lang.Runtime.getRuntime
        .exec(Array("git", "rev-parse", "--short", "HEAD")).getInputStream.readAllBytes()).trim
      catch { case _: Throwable => "unknown" }
    val utc = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())

    val total = wallLow + wallHigh + qtimes.map(_._2).sum
    // Locale.ROOT: the artifact is JSON — a comma-decimal default locale
    // would emit 1,23 and break every downstream parser (ADVICE r4)
    def f(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = qtimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val cs = ctimes.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    def arr(xs: Double*) = xs.map(f).mkString("[", ",", "]")
    def details(ss: Seq[Sample]) = ss.map(s =>
      s"""{"ord":${s.ordinal},"wall":${f(s.wall)},"steal":${f(s.stealSec)},""" +
        s""""gc_ms":${s.gcMs},"rss_mb":${s.rssMb}}""").mkString("[", ",", "]")
    val sw = stageWalls.map { case (k, v) => s""""$k":${f(v)}""" }.mkString("{", ",", "}")
    val kg =
      s""""kg":{"pages":$pages,"resolved_triples":$nHigh,""" +
        s""""cores_low":$coresLow,"cores_high":$coresHigh,""" +
        s""""wall_low_sec":${f(wallLow)},"wall_high_sec":${f(wallHigh)},""" +
        s""""triples_per_sec_low":${f(thrLow)},"triples_per_sec_high":${f(thrHigh)},""" +
        s""""scaling_efficiency":${f(eff)},""" +
        s""""samples_low_sec":${arr(lows.map(_.wall): _*)},""" +
        s""""samples_high_sec":${arr(highs.map(_.wall): _*)},""" +
        s""""steal_low_sec":${arr(lows.map(_.stealSec): _*)},""" +
        s""""steal_high_sec":${arr(highs.map(_.stealSec): _*)},""" +
        s""""samples_low_detail":${details(lows)},""" +
        s""""samples_high_detail":${details(highs)},""" +
        s""""stage_walls_high_sec":$sw,""" +
        s""""stage_profile_total_sec":${f(profWall)},""" +
        s""""stage_profile_steal_sec":${f(profSteal)}}"""
    val kgFull =
      s""""kg_full":{"pages":$pages,"resolved_triples":$nFull,""" +
        s""""wall_low_sec":${f(fullWallLow)},"wall_high_sec":${f(fullWallHigh)},""" +
        s""""triples_per_sec_high":${f(nFull / fullWallHigh)},""" +
        s""""scaling_efficiency":${f(fullEff)},""" +
        s""""samples_low_detail":${details(fullLows)},""" +
        s""""samples_high_detail":${details(fullHighs)}}"""
    val skewStages = skewRows.take(8).map(r =>
      s"""{"stage":${r.stageId},"tasks":${r.nTasks},"median_ms":${r.medianMs},""" +
        s""""max_ms":${r.maxMs},"ratio":${f(r.ratio)}}""").mkString("[", ",", "]")
    val skew =
      s""""skew":{"pages":${skewCfg.nPages},"hot_cluster_frac":0.2,""" +
        s""""hot_domain_frac":0.3,"wall_sec":${f(skewWall)},""" +
        s""""resolved_triples":$skewTriples,""" +
        s""""worst_task_over_median":${f(skewRows.headOption.map(_.ratio).getOrElse(1.0))},""" +
        s""""stages":$skewStages}"""
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,""" +
        s""""curation_queries":$cs,$kg,$kgFull,$skew,""" +
        s""""sf":"$sfDir","git_sha":"$gitSha","utc":"$utc"}"""
    // stdout line for humans AND a file for machines: sbt wraps stdout in
    // [info] noise, which left the driver's `parsed` field null in r1
    println(json)
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/last_run.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
      // run history: one immutable file per run, named by time + commit —
      // the r2 bench dispute was unadjudicable precisely because last_run
      // .json was overwritten per run with no provenance
      val hist = java.nio.file.Paths.get("BENCH/runs")
      java.nio.file.Files.createDirectories(hist)
      java.nio.file.Files.writeString(hist.resolve(s"$utc-$gitSha.json"), json + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] write failed: $e") }
  }
}
