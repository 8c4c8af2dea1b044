package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * benchmark decontamination, deterministic stratified sampling, length
  * binning, and sequence packing. Like [[TextStats]], these extend the
  * engine beyond the reference's KG surface into the data-pipeline scope
  * the north rule grades alongside it (the reference has no curation
  * surface — SURVEY.md §5 delegates quality to LLM regression suites).
  *
  * Scale stance: everything here is either a narrow codegen'd column, a
  * broadcast semi-join against a bounded side, or a window partitioned by a
  * real stratum (lang / source shard) — no global sorts, no driver loops.
  */
object Curation {

  /** Distinct word n-grams of a document as a codegen'd column: lowercase,
    * split on whitespace runs, windows joined by single spaces. Empty for
    * texts shorter than n tokens. The sequence end is clamped so the
    * non-taken when-branch can never build a descending sequence (same
    * guard as TextStats.repetitionMetrics).
    */
  def ngramsCol(text: Column, n: Int): Column = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val toks = filter(split(lower(trim(text)), "\\s+"), x => x =!= lit(""))
    val cnt = size(toks)
    when(cnt >= n,
      array_distinct(transform(
        sequence(lit(1), greatest(cnt - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination (the standard pretraining hygiene pass,
    * e.g. GPT-3 App. C / Llama eval-overlap filtering): flag every training
    * document sharing at least one word n-gram with the benchmark corpus.
    * Returns (idCol, n_hits = distinct contaminated n-grams per doc) for
    * contaminated docs only.
    *
    * Scale: benchmark eval sets are bounded (≪ 1 GB of distinct grams even
    * for every public benchmark combined) while the training corpus is the
    * 100 TB side — so the gram set is broadcast and the training side is
    * one narrow map + partial-agg pass, never shuffled by gram. For a
    * benchmark side too large to broadcast, drop the hint and Spark falls
    * back to a shuffle join on the gram key (bounded fan-out: grams are
    * near-unique).
    */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(ngramsCol(col(textCol), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol), explode(ngramsCol(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Deterministic hash bucket in [0, mod): FNV-1a 64-bit over the key's
    * string form ([[TextStats.fingerprint64]] — DuckDB-reproducible, unlike
    * xxhash64), then positive modulus. Stable across runs, partitionings,
    * and engines — the property random() samplers lack and the reason
    * reproducible pipelines sample by hash.
    */
  def hashBucketCol(key: Column, mod: Int): Column =
    pmod(TextStats.fingerprintCol(key.cast("string")), lit(mod.toLong))

  /** Deterministic stratified sampling: keep a row iff its hash bucket
    * falls below the stratum's per-cent rate. Pure narrow filter — at
    * 100 TB this runs map-side at scan speed with the filter applied
    * before any shuffle, and re-running yields the identical sample.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      ratesPct: Map[String, Int],
      defaultPct: Int): DataFrame = {
    val rate = ratesPct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucketCol(col(keyCol), 100))
      .where(col("bucket") < rate)
  }

  /** Exact per-stratum quantile binning (ntile) with per-bin stats —
    * length-bucketing for curriculum schedules and packing efficiency.
    * The window is partitioned by the stratum so each stratum sorts
    * independently (parallel across strata); the (value, id) order key is
    * total, so bin assignment is deterministic. For a single gigantic
    * stratum at 100 TB, swap ntile for approx_percentile boundaries — the
    * exact form is the oracle-checkable reference semantics.
    */
  def quantileBins(
      df: DataFrame,
      strataCol: String,
      valueCol: String,
      idCol: String,
      nBins: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(valueCol), col(idCol))
    df.withColumn("bin", ntile(nBins).over(w).cast("long"))
      .groupBy(col(strataCol), col("bin"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }

  /** C4-style heuristic cleaning (Raffel et al. 2020, §2.2 — the rules the
    * original C4 corpus was built with, minus the word-list filter):
    * keep a line iff it ends in terminal punctuation (. ! ? "), has ≥ 5
    * whitespace words, and does not mention "javascript" (the
    * enable-javascript boilerplate tell); keep a document iff ≥ 3 lines
    * survive AND the raw text contains neither "lorem ipsum" nor "{"
    * (placeholder/code tells). Returns every input row with
    * (n_lines, n_kept, keep_doc, text_clean) so the caller can filter or
    * audit drop reasons.
    *
    * All array-lambda string ops over one split — a narrow codegen'd
    * column, zero shuffles, scan-speed at 100 TB like the rest of this
    * file.
    */
  def c4Clean(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l => {
      val s = trim(l)
      (s.endsWith(".") || s.endsWith("!") || s.endsWith("?") || s.endsWith("\"")) &&
        size(split(s, "\\s+")) >= 5 &&
        !contains(lower(s), lit("javascript"))
    })
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (size(kept) >= 3 &&
        !contains(lower(t), lit("lorem ipsum")) &&
        !contains(t, lit("{"))).as("keep_doc"),
      array_join(kept, "\n").as("text_clean"))
  }

  /** Deterministic weighted sampling WITHOUT replacement — the A-ES
    * exponential race of Efraimidis & Spirakis (IPL 2006): each row draws
    * u_i ∈ (0,1) from its id hash and the n smallest keys
    * e_i = −ln(u_i)/w_i win, which makes inclusion probability
    * proportional to weight with no replacement — the quality-weighted
    * corpus subsample (keep 10 B of 100 B docs, favoring high quality
    * scores) in ONE TakeOrderedAndProject pass, no global sort, no
    * sequential scan over a cumulative distribution. u_i is the FNV ppb
    * bucket of the id, not an RNG, so the same sample comes back on every
    * run, partitioning, and engine.
    *
    * The race key is rounded to 1e-9 with an id tiebreak before selection:
    * `ln` is not correctly-rounded IEEE, so an unrounded key could differ
    * in the last ulp across engines and flip the boundary row — the same
    * discipline as [[lmPerplexityBuckets]]. Rows with non-positive weight
    * are filtered out (their race keys would be infinite).
    */
  def weightedSample(
      df: DataFrame,
      n: Int,
      weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "weightedSample: n must be >= 1")
    val u = (pmod(TextStats.fingerprintCol(col(idCol).cast("string")),
      lit(1000000000L)).cast("double") + lit(0.5)) / lit(1.0e9)
    df.where(col(weightCol) > 0)
      .withColumn("es_key", round(-log(u) / col(weightCol).cast("double"), 9))
      .orderBy(col("es_key"), col(idCol))
      .limit(n)
  }

  /** Dictionary blocklist filtering (the C4 §2.2 "bad words" rule, Raffel
    * et al. 2020; RefinedWeb and Gopher run the same shape with larger
    * per-language lists): flag every document whose token stream contains
    * a blocklisted word. Emits one row per INPUT document —
    * (id, n_tokens, n_flagged, first_flagged, keep_doc) — so the caller
    * audits what the filter removes instead of silently losing rows
    * (the drop-reason discipline of [[c4Clean]]).
    *
    * Matching is exact on whitespace tokens of the lowercased text — the
    * auditable contract (a substring match would flag "scrape" for
    * "rape"-class entries; C4 matches words). `first_flagged` is the first
    * offending token in document order, the audit sample.
    *
    * Scale shape: real blocklists are bounded (C4's list is ~400 entries,
    * the multi-language union a few thousand) so the dictionary rides the
    * plan as a literal array and the whole filter is one narrow codegen'd
    * column pass — zero shuffles, scan-speed at 100 TB. For a dictionary
    * too large to inline, swap the membership test for a broadcast-Bloom
    * probe ([[Dedup.bloomNewDocs]] shape) — still one map-only pass.
    */
  def blocklistFilter(
      df: DataFrame,
      blocklist: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(blocklist.nonEmpty, "blocklistFilter: empty blocklist")
    val dict = lit(blocklist.map(_.toLowerCase).distinct.sorted.toArray)
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= lit(""))
    val flagged = filter(toks, x => array_contains(dict, x))
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(flagged).cast("long").as("n_flagged"),
      when(size(flagged) > 0, element_at(flagged, 1)).otherwise(lit(""))
        .as("first_flagged"),
      (size(flagged) === 0).as("keep_doc"))
  }

  /** Cross-document line deduplication (the CCNet/RefinedWeb boilerplate
    * pass): drop every non-blank line that appears in more than
    * `maxDupDocs` distinct documents (navigation chrome, cookie banners,
    * repeated footers), reassemble the remaining lines in order. Returns
    * (id, n_lines, n_lines_kept, text_clean) for every input document —
    * fully-boilerplate docs survive with empty text_clean, so the caller
    * can length-filter afterwards.
    *
    * Scale shape: one posexplode, one count-distinct keyed by line
    * content, one anti-join back, one per-doc reassembly aggregate — all
    * shuffles keyed by line or doc id. At 100 TB, key the dup table by
    * xxhash64(line) instead of the raw string so the shuffle carries 8
    * bytes per line (collisions only over-remove, which boilerplate
    * filtering tolerates); the raw-string form here keeps the semantics
    * oracle-checkable.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDupDocs: Int = 1): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val dupLines = lines.where(trim(col("line")) =!= "")
      .groupBy(col("line")).agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") > maxDupDocs).select(col("line"))
    val kept = lines.join(dupLines, Seq("line"), "left_anti")
    val agg = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), "\n").as("text_clean"))
    df.select(col(idCol), size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Temperature-based mixture resampling (the Pile / CC-mix reweighting
    * pass): per-stratum sampling rates r_s = min(1, T·√n_s / Σ√n / n_s)
    * flatten the source distribution toward α = 0.5 (α fixed at ½ so the
    * weight is `sqrt` — correctly rounded IEEE in every engine, unlike
    * `pow`, which keeps the rate table bit-reproducible in the oracle).
    * `targetTotal` is the desired output corpus size. Returns one row per
    * stratum: (stratum, n_docs, rate_ppm) with the rate floored to parts-
    * per-million — the integer form the deterministic sampler consumes.
    *
    * Scale: one partial-agg count shuffle over the corpus; the rate table
    * is O(strata) and broadcasts back for the sampling pass.
    */
  def temperatureRates(
      df: DataFrame,
      strataCol: String,
      targetTotal: Long): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    // Σ√n folded in SORTED stratum order on the driver (O(strata) rows):
    // a distributed float sum is partition-order-dependent, which would
    // break the bit-reproducibility the oracle compare needs
    val sumW = counts.select(col(strataCol).cast("string"), col("n_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).foldLeft(0.0)((a, kv) => a + math.sqrt(kv._2.toDouble))
    counts.select(
      col(strataCol), col("n_docs"),
      least(lit(1000000L),
        floor(lit(1000000.0) * lit(targetTotal.toDouble) * sqrt(col("n_docs"))
          / lit(sumW) / col("n_docs")).cast("long")).as("rate_ppm"))
  }

  /** Apply a [[temperatureRates]] table: keep a row iff its FNV hash bucket
    * (ppm-granular) falls under its stratum's rate. Broadcast of the
    * O(strata) rate table + a narrow filter — the corpus never shuffles.
    */
  def temperatureSample(
      df: DataFrame,
      rates: DataFrame,
      strataCol: String,
      keyCol: String): DataFrame =
    df.join(broadcast(rates.select(col(strataCol), col("rate_ppm"))), strataCol)
      .where(hashBucketCol(col(keyCol), 1000000) < col("rate_ppm"))
      .drop("rate_ppm")

  /** CCNet-style language-model quality bucketing (Wenzek et al. 2020 §4.3
    * — the perplexity filter every web-scale pretraining corpus runs): train
    * a per-stratum (per-language) bigram LM on a trusted reference slice,
    * score every document by its per-token negative log-likelihood under
    * that LM, and split each stratum into `nBuckets` quantile buckets
    * (bucket 1 = "head" / most-fluent, last = "tail"). CCNet uses KenLM
    * 5-grams over Wikipedia; the add-k-smoothed bigram form here keeps the
    * semantics exactly replicable in the SQL oracle while preserving the
    * operator shape (train → broadcastable model → map-side score → bucket).
    *
    * Model: p(w2|w1) = (c(w1 w2) + k) / (c(w1·) + k·V) with V = distinct
    * train tokens + 1 (one unit of open-vocabulary mass — unseen heads and
    * continuations fall back to k/(k·V) = 1/V). Documents with < 2 tokens
    * have no bigrams and are excluded (CCNet drops them pre-scoring).
    *
    * Float-parity stance (the repo-wide ranking rule): +, ×, / are
    * correctly-rounded IEEE and engine-identical, but `ln` is not, and the
    * per-doc sum of log-probs is partition-order-dependent — so the bucket
    * boundary orders by the score ROUNDED to 1e-9 (ties by id), which
    * collapses ulp noise, and the raw float stays out of any gated output.
    *
    * Scale shape: the LM tables are O(train corpus) — the trusted slice is
    * bounded (CCNet's Wikipedia is ~GBs against a 100 TB crawl), so the
    * gram joins broadcast under AQE; the corpus side is one explode + two
    * bounded-key joins + one per-doc partial aggregation. The per-stratum
    * ntile window parallelizes across languages; for one gigantic stratum
    * swap the exact ntile for approx_percentile boundaries (same tradeoff
    * documented on [[quantileBins]]).
    */
  def lmPerplexityBuckets(
      docs: DataFrame,
      train: DataFrame,
      idCol: String = "doc_id",
      strataCol: String = "lang",
      textCol: String = "text",
      smoothK: Double = 0.5,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    def toks(df: DataFrame) = df.select(col(idCol), col(strataCol),
      filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= lit("")).as("tk"))
    def grams(df: DataFrame) = df.where(size(col("tk")) >= 2)
      .select(col(idCol), col(strataCol),
        explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat(element_at(col("tk"), i), lit(" "),
            element_at(col("tk"), i + 1)))).as("gram"))
    val trainToks = toks(train)
    // V per stratum: distinct train tokens + 1 (open-vocab mass)
    val vocabSize = trainToks
      .select(col(strataCol), explode(col("tk")).as("w"))
      .groupBy(col(strataCol))
      .agg((countDistinct(col("w")) + 1).cast("double").as("v"))
    val c2 = grams(trainToks)
      .groupBy(col(strataCol), col("gram"))
      .agg(count(lit(1)).cast("double").as("c2"))
    // head counts fold from c2 (already aggregated — no second corpus pass)
    val c1 = c2
      .groupBy(col(strataCol), substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    grams(toks(docs))
      .join(c2, Seq(strataCol, "gram"), "left")
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(c1, Seq(strataCol, "w1"), "left")
      .join(broadcast(vocabSize), Seq(strataCol))
      .withColumn("logp",
        log((coalesce(col("c2"), lit(0.0)) + smoothK) /
          (coalesce(col("c1"), lit(0.0)) + lit(smoothK) * col("v"))))
      .groupBy(col(idCol), col(strataCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp")).as("nll_sum"))
      .withColumn("rscore", round(-col("nll_sum") / col("n_bigrams"), 9))
      .withColumn("ppl_bucket", ntile(nBuckets).over(
        Window.partitionBy(col(strataCol)).orderBy(col("rscore"), col(idCol))))
      .select(col(idCol), col(strataCol), col("n_bigrams"), col("rscore"),
        col("ppl_bucket").cast("long").as("ppl_bucket"))
  }

  /** Contiguous sequence packing: assign each document to the fixed-budget
    * pack containing its start offset in the stratum's concatenated token
    * stream (pack_id = floor(prefix_tokens / budget)). This is the
    * deterministic shard-local packing a training-data writer does before
    * emitting fixed-length examples; the stratum (source shard) bounds the
    * window so packing parallelizes across shards exactly as it does
    * across output files in production.
    */
  def packContiguous(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      textCol: String,
      budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextStats.tokenCountCol(col(textCol)))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / budgetTokens))
      .groupBy(col(strataCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  /** Deterministic global shuffle into training shards — the materialization
    * step between a curated corpus and a training data loader. Every doc is
    * assigned shard = FNV-1a(doc_id ":" seed) mod nShards and a position
    * within its shard ordered by (hash, doc_id): a reproducible random
    * permutation (re-running yields byte-identical shards; changing `seed`
    * yields an independent one) with no global sort — assignment is a narrow
    * codegen'd column and the position window is partitioned by shard, so
    * the work parallelizes across shards (at 100 TB pick nShards large
    * enough that one shard fits an executor: 100k shards ≈ 1 GB each).
    * Emits (doc_id, shard_id, pos, n_tokens); write with
    * `partitionBy("shard_id")` + sortWithinPartitions(pos) for one
    * sequentially-readable file per shard.
    */
  def shuffleShards(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, seed: String = "s0"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = TextStats.fingerprintCol(concat(col(idCol), lit(":"), lit(seed)))
    val w = Window.partitionBy(col("shard_id")).orderBy(col("h"), col(idCol))
    df.select(col(idCol), col(textCol))
      .withColumn("h", h)
      .withColumn("shard_id", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n_tokens", TextStats.tokenCountCol(col(textCol)))
      .select(col(idCol), col("shard_id"), col("pos"), col("n_tokens"))
  }

  /** Per-shard manifest over a [[shuffleShards]] assignment: doc/token
    * counts plus an order-sensitive content digest (bit_xor of
    * FNV-1a(pos ":" doc_id) — xor is order-free, but pos bakes the order
    * into each term, so any reorder, drop, or duplicate flips the digest).
    * One partial-agg shuffle keyed by shard; the manifest is what a loader
    * checks before trusting a shard and what an incremental rebuild diffs.
    */
  def shardManifest(shards: DataFrame, idCol: String): DataFrame =
    shards
      .withColumn("term",
        TextStats.fingerprintCol(concat(col("pos"), lit(":"), col(idCol))))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("bit_xor(term)").as("digest"))

  /** DSIR data selection (Xie et al. 2023, arXiv:2302.03169): score every
    * raw document by its importance weight under hashed-n-gram bag models of
    * a TARGET corpus vs the RAW corpus, and keep the top `selectK`. The
    * features are word unigrams + bigrams hashed into `nBuckets` buckets
    * (md5-derived — engine-reproducible by construction); per-bucket
    * log-ratios use add-1 smoothing; a document's log-weight is the SUM of
    * its features' log-ratios (paper §2.2, bag-of-hashed-ngrams estimator).
    *
    * Determinism contract: the float log-weight never reaches the gated
    * output — docs are ranked by round(weight, 9) with doc_id tie-break
    * (the repo's standard ln-ulp absorber) and the emitted columns are
    * (doc_id, n_feats, rank ∈ 1..selectK or null, selected).
    *
    * Scale: one explode per corpus into bucket ids, one partial-agg shuffle
    * keyed by bucket (≤ nBuckets rows out — Zipf-hot features are absorbed
    * map-side), the bucket model broadcast back onto the raw explode
    * (nBuckets is chosen small precisely so the model is a broadcast
    * table), one per-doc agg. The top-K cut is orderBy+limit —
    * TakeOrderedAndProject, per-partition heaps, never a global sort — and
    * only the K selected rows see a numbering window (bounded frame, same
    * dispensation as the retrievers' topK seed collects). A full global
    * rank of every raw doc is deliberately NOT emitted: that would be a
    * single-task window at corpus scale for a column nothing downstream
    * reads.
    */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      selectK: Int,
      nBuckets: Int = 8192,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    // unigrams ++ bigrams, NOT distinct — DSIR counts occurrences
    def feats(df: DataFrame) = {
      val toks = filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= lit(""))
      df.select(col(idCol), toks.as("tk"))
        .where(size(col("tk")) >= 1)
        .select(col(idCol), explode(concat(
          col("tk"),
          when(size(col("tk")) >= 2,
            transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat(element_at(col("tk"), i), lit(" "),
                element_at(col("tk"), i + 1))))
            .otherwise(array().cast("array<string>")))).as("feat"))
        // 15 hex chars < 2^60 — exact in a long; identical fold in DuckDB
        .withColumn("bucket",
          pmod(conv(substring(md5(col("feat")), 1, 15), 16, 10).cast("long"),
            lit(nBuckets.toLong)))
        .select(col(idCol), col("bucket"))
    }
    def bucketCounts(df: DataFrame, cnt: String) =
      feats(df).groupBy(col("bucket")).agg(count(lit(1)).cast("double").as(cnt))
    val tCnt = bucketCounts(target, "ct")
    val rFeats = feats(raw)
    val rCnt = rFeats.groupBy(col("bucket")).agg(count(lit(1)).cast("double").as("cr"))
    // totals as 1-row broadcast frames (no driver action on the hot path)
    val tTot = tCnt.agg(sum(col("ct")).as("tott"))
    val rTot = rCnt.agg(sum(col("cr")).as("totr"))
    val model = rCnt.join(tCnt, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0.0)) + 1.0) / (col("tott") + nBuckets)) -
         log((coalesce(col("cr"), lit(0.0)) + 1.0) / (col("totr") + nBuckets))).as("lr"))
    val scored = rFeats.join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("logw"))
      .withColumn("rlogw", round(col("logw"), 9))
    val top = scored.orderBy(col("rlogw").desc, col(idCol)).limit(selectK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rlogw").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rank"))
    scored.join(broadcast(top), Seq(idCol), "left")
      .select(col(idCol), col("n_feats"), col("rank"),
        col("rank").isNotNull.as("selected"))
  }
}
