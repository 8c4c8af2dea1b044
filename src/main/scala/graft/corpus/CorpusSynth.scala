package graft.corpus

import java.sql.Timestamp
import scala.util.Random

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.{HtmlText, Normalize}
import graft.model.Page

/** Deterministic Common-Crawl-style corpus with planted ground truth
  * (FIXTURES.md §1-2). No external data; every page is a PURE function of
  * (seed, pageIdx, params) so generation runs distributively via
  * `spark.range(nPages).mapPartitions` — at bench scale nothing is
  * materialized on the driver.
  *
  * Planted structure:
  *   - `nClusters` alias clusters (person/org/place), 2-4 surface variants
  *     each, mirroring the reference's van-Gogh example
  *     (`ecc/app/graphrag/graph_rag.py:488`);
  *   - per-cluster 12-pseudo-word description + 1 alias-specific word, so a
  *     token-hash embedding puts same-cluster aliases at cosine ≈ 12/13 >
  *     0.90 and cross-cluster pairs near 0 (the reference's ER thresholds,
  *     `tigergraph_embedding_store.py:376`);
  *   - fact sentences "<alias> <verb phrase> <alias>." with a fixed verb
  *     inventory → golden (subj, pred, obj) triples; a small seeded fraction
  *     is garbled so extraction recall stays realistically < 1 but ≥ 0.95
  *     (reference parse-failure-drops-chunk semantics,
  *     `LLMEntityRelationshipExtractor.py:142-143`).
  */
object CorpusSynth extends Serializable {

  final case class Config(
      seed: Long = 42L,
      nPages: Int = 100,
      nClusters: Int = 24,
      noiseFrac: Double = 0.02,
      /** Topic-block structure: clusters live in blocks of `blockSize`; a
        * fact's object is drawn from the subject's block with probability
        * `blockBias` — gives the resolved-entity graph real community
        * structure for the Louvain stage (cross-block facts remain, as on
        * the real web).
        */
      blockSize: Int = 6,
      blockBias: Double = 0.85,
      /** Adversarial web-Zipf knobs (r4, default OFF): with probability
        * `hotClusterFrac` a fact's subject is cluster 0 — the
        * "united_states" entity that lands in ~that fraction of chunks and
        * hammers the description merge / ER / lift joins; with probability
        * `hotDomainFrac` a page's site is one hot domain (~that fraction of
        * the crawl). Both draws are GATED on > 0 so the default rng
        * sequence — and with it every pinned digest — is bit-identical to
        * pre-r4 corpora.
        */
      hotClusterFrac: Double = 0.0,
      hotDomainFrac: Double = 0.0)

  /** Golden resolved triple (canonical ids) with page provenance. */
  final case class GoldenTriple(subj_canonical: String, pred: String, obj_canonical: String, url: String)
  /** Same-cluster alias-id pair (entity linking ground truth), a < b. */
  final case class GoldenLink(entity_id_a: String, entity_id_b: String)

  /** Verb inventory: surface phrase → normalized predicate (relationType,
    * `LLMEntityRelationshipExtractor.py:64`).
    */
  val Verbs: Vector[(String, String)] = Vector(
    "works at", "was born in", "is located in", "founded",
    "acquired", "collaborated with", "painted", "moved to"
  ).map(v => v -> Normalize.relationType(v))

  private val Consonants = Vector("b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z")
  private val VowelS = Vector("a", "e", "i", "o", "u")

  /** Globally-unique pseudo-word for counter value n (bijective syllables). */
  private[corpus] def pseudoWord(n: Long): String = {
    val sb = new StringBuilder
    var v = n
    var k = 0
    do {
      sb.append(Consonants(((v + k * 7) % Consonants.size).toInt))
      sb.append(VowelS(((v / Consonants.size + k * 3) % VowelS.size).toInt))
      v /= (Consonants.size * VowelS.size)
      k += 1
    } while (v > 0 || k < 3)
    sb.toString
  }

  private def cap(s: String): String = s.capitalize

  /** Cluster metadata — pure in (cfg.seed, c). */
  final case class Cluster(
      id: Int,
      category: String,       // node_type surface form fed to Normalize.nodeType
      aliases: Vector[String], // surface forms (distinct ids after processId)
      descWords: Vector[String],
      aliasTails: Vector[String]) {
    def aliasIds: Vector[String] = aliases.map(Normalize.processId)
    /** Canonical id by the deterministic ER tiebreak: max (length, lexicographic)
      * over the cluster's alias ids — the longest-id rule of
      * `ecc/app/graphrag/workers.py:460-468` made deterministic.
      */
    def canonicalId: String = aliasIds.maxBy(id => (id.length, id))
    /** Definition phrase for alias k (shared 12 words + 1 alias word). */
    def definition(k: Int): String = (descWords :+ aliasTails(k)).mkString(" ")
  }

  def cluster(cfg: Config, c: Int): Cluster = {
    val rng = new Random(cfg.seed * 7919 + c)
    val stemBase = c.toLong * 20L
    val w = (0 until 20).map(j => pseudoWord(stemBase + j + 1000))
    val category = (c % 3) match {
      case 0 => "person"
      case 1 => "organization"
      case _ => "place"
    }
    val aliases = (c % 3) match {
      case 0 =>
        val first = cap(w(0)); val last = cap(w(1))
        Vector(s"$first $last", last, s"${first.take(1)}. $last")
      case 1 =>
        val stem = cap(w(0))
        Vector(s"$stem Corporation", s"$stem Corp", stem, s"The $stem Group")
      case _ =>
        val stem = cap(w(0))
        Vector(s"${stem}ville", s"City of ${stem}ville")
    }
    val descWords = (2 until 14).map(w(_)).toVector
    val tails = aliases.indices.map(k => w(14 + k)).toVector
    // keep rng in the signature for future knobs; touch it so it's not unused
    rng.nextInt()
    Cluster(c, category, aliases, descWords, tails)
  }

  /** Everything planted on one page — pure in (cfg, i). */
  final case class PageTruth(
      page: Page,
      triples: Seq[GoldenTriple],
      noisyTriples: Seq[GoldenTriple])

  def renderPage(cfg: Config, i: Long): PageTruth = {
    val rng = new Random(cfg.seed * 1000003L + i)
    val nFacts = 3 + rng.nextInt(3)

    final case class Fact(subj: Cluster, sAlias: Int, verb: Int, obj: Cluster, oAlias: Int, noisy: Boolean)
    val facts = (0 until nFacts).map { _ =>
      val sc =
        if (cfg.hotClusterFrac > 0 && rng.nextDouble() < cfg.hotClusterFrac) 0
        else rng.nextInt(cfg.nClusters)
      var oc =
        if (rng.nextDouble() < cfg.blockBias && cfg.nClusters > cfg.blockSize) {
          val block = sc / cfg.blockSize
          val lo = block * cfg.blockSize
          val hi = math.min(lo + cfg.blockSize, cfg.nClusters)
          lo + rng.nextInt(hi - lo)
        } else rng.nextInt(cfg.nClusters)
      if (oc == sc) oc = (oc + 1) % cfg.nClusters
      val s = cluster(cfg, sc); val o = cluster(cfg, oc)
      Fact(s, rng.nextInt(s.aliases.size), rng.nextInt(Verbs.size),
        o, rng.nextInt(o.aliases.size), rng.nextDouble() < cfg.noiseFrac)
    }

    // one definition line per distinct (cluster, alias) used on the page
    val defs = facts
      .flatMap(f => Seq((f.subj, f.sAlias), (f.obj, f.oAlias)))
      .distinct
      .map { case (cl, k) => s"${cl.aliases(k)} is ${cl.definition(k)}." }

    val factLines = facts.map { f =>
      val verbSurface = if (f.noisy) pseudoWord(9000 + rng.nextInt(50)) else Verbs(f.verb)._1
      s"${f.subj.aliases(f.sAlias)} $verbSurface ${f.obj.aliases(f.oAlias)}."
    }

    val filler = Seq(
      s"The ${pseudoWord(5000 + rng.nextInt(200))} report covers R&D findings.",
      s"Crawled notes about ${pseudoWord(5200 + rng.nextInt(200))} and more.")

    val title = s"Notes ${pseudoWord(6000 + (i % 400))} $i"
    val lines: Seq[String] = (title +: (defs ++ factLines ++ filler))

    val site =
      if (cfg.hotDomainFrac > 0 && rng.nextDouble() < cfg.hotDomainFrac) "hothub"
      else pseudoWord(7000 + (i % 97))
    val pathCase = if (i % 10 == 0) s"Page-$i" else s"page-$i"
    val url = s"https://$site.example.org/$pathCase"
    val lang = (i % 17) match {
      case 15 => "de"
      case 16 => "fr"
      case _  => "en"
    }
    val ts = new Timestamp(1735689600000L + i * 137000L) // 2025-01-01T00:00Z + i*137s

    val body = lines.tail.map(l => s"<p>${escapeHtml(l)}</p>").mkString
    val html =
      s"""<!DOCTYPE html><html><head><title>${escapeHtml(title)}</title>""" +
        s"""<script type="text/javascript">var crawl=$i;</script>""" +
        s"""<style>p { margin: 0; }</style></head>""" +
        s"""<body><!-- warc $url --><h1>${escapeHtml(title)}</h1>$body</body></html>"""
    // the extractor sees <title> and <h1> — title appears twice by design
    val text = (Seq(title, title) ++ lines.tail).mkString("\n")

    val docId = Normalize.docId(url)
    val (noisy, clean) = facts.partition(_.noisy)
    def toGolden(f: Fact) =
      GoldenTriple(f.subj.canonicalId, Verbs(f.verb)._2, f.obj.canonicalId, docId)
    PageTruth(
      Page(url, ts, html.getBytes(java.nio.charset.StandardCharsets.UTF_8), text, lang),
      clean.map(toGolden),
      noisy.map(toGolden))
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ---------------------------------------------------------------- datasets

  /** Distributed page generation — scales to arbitrary nPages. */
  def pages(spark: SparkSession, cfg: Config): Dataset[Page] = {
    import spark.implicits._
    spark.range(cfg.nPages).mapPartitions(_.map(i => renderPage(cfg, i).page))
  }

  /** Page slice [from, until) — pages are pure in (seed, i, nClusters), so
    * `pagesRange(cfg, n, m)` is exactly the tail that `pages(cfg(nPages=m))`
    * adds over `pages(cfg(nPages=n))`: the deterministic "new crawl batch"
    * for incremental-run tests.
    */
  def pagesRange(spark: SparkSession, cfg: Config, from: Long, until: Long): Dataset[Page] = {
    import spark.implicits._
    spark.range(from, until).mapPartitions(_.map(i => renderPage(cfg, i).page))
  }

  /** Golden resolved triples (clean facts only; noisy facts are expected
    * recall loss). Includes provenance url.
    */
  def goldenTriples(spark: SparkSession, cfg: Config): Dataset[GoldenTriple] = {
    import spark.implicits._
    spark.range(cfg.nPages).flatMap(i => renderPage(cfg, i).triples)
  }

  /** All planted facts including noisy ones — the denominator for recall. */
  def goldenTriplesAll(spark: SparkSession, cfg: Config): Dataset[GoldenTriple] = {
    import spark.implicits._
    spark.range(cfg.nPages).flatMap { i =>
      val t = renderPage(cfg, i); t.triples ++ t.noisyTriples
    }
  }

  /** Same-cluster alias-id pairs (a < b lexicographically). */
  def goldenLinks(spark: SparkSession, cfg: Config): Dataset[GoldenLink] = {
    import spark.implicits._
    spark.range(cfg.nClusters).flatMap { c =>
      val ids = cluster(cfg, c.toInt).aliasIds.sorted
      for { a <- ids.indices; b <- (a + 1) until ids.size } yield GoldenLink(ids(a), ids(b))
    }
  }

  /** Sanity hook: re-extract text from html and compare (used by tests). */
  def roundTrip(p: Page): Boolean = HtmlText.extract(p.html) == p.text
}
