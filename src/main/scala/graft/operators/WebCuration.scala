package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation operators a Common-Crawl-scale training-data pipeline
  * runs before anything else touches the text: PII redaction and URL
  * canonicalization / domain analytics. Like [[Curation]], these extend the
  * engine beyond the reference's KG surface into the pipeline scope the
  * north rule grades alongside it.
  *
  * Engine-parity stance: every regex below is written in the RE2 ∩ Java
  * common subset (no lookaround, no backreferences, ASCII character
  * classes), so the DuckDB oracle recomputes the exact same matches — the
  * redaction output is hash-compared, not spot-checked.
  *
  * Scale stance: everything here is a narrow codegen'd column (regexp_*,
  * split/filter/sort lambdas) — zero shuffles until the caller aggregates,
  * so at 100 TB these run map-side at scan speed.
  */
object WebCuration {

  // ------------------------------------------------------------------- PII

  /** Email pattern (practical-subset, not RFC 5322 — the standard redaction
    * tradeoff): local part, @, dotted domain, ≥2-letter TLD.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shape `+CC NNN-NNN-NNNN` with space or dash
    * separators — deliberately anchored on the `+` so prose numerals never
    * false-positive (a recall-lighter, precision-safe production default).
    */
  val PhoneRe = "\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}"

  /** Dotted-quad IPv4 on word boundaries. Over-matches out-of-range quads
    * (999.1.1.1) — redaction favors recall; the boundary guards stop it
    * eating version strings inside longer dotted runs.
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: counts per category (on the ORIGINAL text, so categories
    * count independently) plus the redacted text with emails → `<EMAIL>`,
    * phones → `<PHONE>`, IPv4 → `<IP>`, applied in that fixed order (an
    * email's dotted domain is consumed by `<EMAIL>` before the IP pass can
    * see it — order is part of the contract and the oracle replicates it).
    */
  def redactPii(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).as("n_emails"),
      regexp_count(t, lit(PhoneRe)).as("n_phones"),
      regexp_count(t, lit(Ipv4Re)).as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>").as("text_redacted"))
  }

  // ----------------------------------------------------- text normalization

  /** CCNet-style text normalization (Wenzek et al. 2020 §4.1 — the pass run
    * before content hashing so trivially-variant re-crawls dedup together):
    * Unicode NFD decomposition with combining marks stripped (accent
    * removal), lowercase, every ASCII digit replaced by `0`, whitespace runs
    * collapsed to single spaces, trimmed. CCNet's unicode-punctuation
    * replacement is deliberately left out: its mapping table is
    * KenLM-specific and has no cross-engine reference to oracle against,
    * while the four rules here are exactly reproducible in SQL
    * (`strip_accents(nfc_normalize(…))` + `lower` + two regexes), so the
    * q_ccnet_normalize gate hash-compares the FULL normalized text.
    *
    * Per-row JVM function (java.text.Normalizer has no Catalyst
    * counterpart) — the same documented tradeoff as
    * [[TextStats.fingerprint64]]; everything around it stays narrow, so at
    * 100 TB this is still a map-only scan-speed pass.
    */
  val ccnetNormalize: String => String = { s =>
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    nfd.replaceAll("\\p{Mn}+", "")
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[0-9]", "0")
      .replaceAll("\\s+", " ")
      .trim
  }

  /** [[ccnetNormalize]] as a column. Idempotent: normalize ∘ normalize =
    * normalize (asserted in WebCurationSpec), so re-running a resumed
    * pipeline stage over already-normalized text is safe.
    */
  def ccnetNormalizeCol(text: Column): Column = {
    val u = udf(ccnetNormalize)
    u(text)
  }

  // ------------------------------------------------------------------- URL

  /** Lowercased host of a URL (text between `://` and the first `/` or `?`),
    * with any leading `www.` stripped.
    */
  def hostCol(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)), "^www\\.", "")

  /** Registered-domain heuristic: the last two dot-labels of the host.
    * (Production swaps this for a public-suffix-list lookup — a broadcast
    * map — to handle `co.uk`-style suffixes; the two-label form keeps the
    * semantics exactly reproducible in the SQL oracle.)
    */
  def registeredDomainCol(url: Column): Column = {
    val h = hostCol(url)
    when(regexp_extract(h, "([^.]+\\.[^.]+)$", 1) =!= "", regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** Canonical URL for dedup keys, the standard crawl-frontier normalization:
    *   1. drop the fragment;
    *   2. force scheme to https (scheme variants are the same resource);
    *   3. lowercase the host and strip a leading `www.`;
    *   4. strip trailing slashes from the path (empty and "/" collapse);
    *   5. drop tracking params (`utm_*`, `fbclid`, `gclid`), sort the rest.
    * Every step is a codegen'd string expression — no UDF, no parsing
    * library — so the oracle replicates it operator-for-operator.
    */
  def normalizeUrlCol(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = hostCol(noFrag)
    val path = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid=") && !p.startsWith("gclid="))
    val qNorm = array_join(array_sort(params), "&")
    concat(lit("https://"), host, path,
      when(qNorm =!= "", concat(lit("?"), qNorm)).otherwise(lit("")))
  }

  /** URL-level exact dedup groups: one row per canonical URL that more than
    * one document claims, with member count and the deterministic keeper.
    * The crawl-side twin of content dedup ([[Dedup.exactGroups]]) — at
    * 100 TB this collapses re-crawls and tracking-param mirrors before any
    * byte of text is compared; the only shuffle is keyed by the canonical
    * URL string (near-unique, no hot keys by construction).
    */
  def urlDedupGroups(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame =
    df.groupBy(normalizeUrlCol(col(urlCol)).as("url_norm"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))
      .where(col("cnt") > 1)

  /** Per-domain document quota (the crawl-balance pass): keep at most `k`
    * documents per registered domain, preferring higher `orderCol` (quality
    * score, length, …) with id tie-break — the standard guard against one
    * link-farm domain dominating a training mix. Returns the kept rows with
    * (domain, rank ∈ 1..k) attached.
    *
    * Scale: a single window keyed by domain would pin each domain to one
    * task — and crawl domains are exactly the key with million-row hot
    * entries — so this is the repo's salted TWO-PHASE top-k (same shape as
    * BM25/RRF ranking): rank within (domain, crc32(id) % 64) first, then
    * rank the ≤ 64·k survivors per domain. The ordering key is exact
    * integer/string comparison — no float, nothing to round, the SQL oracle
    * replicates it verbatim.
    */
  def domainQuota(
      df: DataFrame,
      k: Int,
      urlCol: String = "url",
      idCol: String = "doc_id",
      orderCol: String = "n_chars"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDomain = df.withColumn("domain", registeredDomainCol(col(urlCol)))
    val pre = Window.partitionBy(col("domain"), crc32(col(idCol).cast("string")) % 64)
      .orderBy(col(orderCol).desc, col(idCol).asc)
    val fin = Window.partitionBy(col("domain"))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    withDomain
      .withColumn("prerank", row_number().over(pre)).where(col("prerank") <= k)
      .withColumn("rank", row_number().over(fin)).where(col("rank") <= k)
      .drop("prerank")
  }

  /** Per-registered-domain corpus stats — the source-quality table every
    * web-scale pipeline maintains (domain allow/deny lists, per-domain
    * sampling weights). One partial-agg shuffle keyed by domain; token
    * counts are [[TextStats.tokenCountCol]] so the oracle replica is exact.
    */
  def domainStats(df: DataFrame, urlCol: String = "url", textCol: String = "text"): DataFrame =
    df.groupBy(registeredDomainCol(col(urlCol)).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(hostCol(col(urlCol))).as("n_hosts"),
        sum(TextStats.tokenCountCol(col(textCol))).as("total_tokens"))
}
