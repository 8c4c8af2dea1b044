package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WebCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("redactPii replaces emails, phones and IPv4s and counts each on the original text") {
    val df = Seq(
      (1L, "Mail a.b-c%d@sub.example.co.uk or x@y.io now"),
      (2L, "Call +1 555-123-4567 or +44 201-555-0199."),
      (3L, "Server at 192.168.0.1, backup 10.0.0.254."),
      (4L, "version 1.2.3 is not an ip, nor is 1.2.3.4.5 fenced"),
      (5L, "clean text")).toDF("doc_id", "text")
    val out = WebCuration.redactPii(df).orderBy("doc_id").collect()

    assert(out(0).getAs[Int]("n_emails") == 2)
    assert(out(0).getAs[String]("text_redacted") == "Mail <EMAIL> or <EMAIL> now")
    assert(out(1).getAs[Int]("n_phones") == 2)
    assert(out(1).getAs[String]("text_redacted") == "Call <PHONE> or <PHONE>.")
    assert(out(2).getAs[Int]("n_ips") == 2)
    assert(out(2).getAs[String]("text_redacted") == "Server at <IP>, backup <IP>.")
    // "1.2.3" has no 4th quad; "1.2.3.4.5" — \b guards do NOT stop a match
    // ending before ".5" (the boundary between '4' and '.' is a word
    // boundary), so the first four quads redact: recall-favoring semantics
    assert(out(3).getAs[Int]("n_ips") == 1)
    assert(out(3).getAs[String]("text_redacted") == "version 1.2.3 is not an ip, nor is <IP>.5 fenced")
    assert(out(4).getAs[Int]("n_emails") == 0 && out(4).getAs[Int]("n_phones") == 0
      && out(4).getAs[Int]("n_ips") == 0)
    assert(out(4).getAs[String]("text_redacted") == "clean text")
  }

  test("normalizeUrlCol: scheme force, host lower, www strip, slash strip, tracking params out, params sorted") {
    val cases = Seq(
      ("http://WWW.Example.COM/a/b/?z=2&utm_source=x&a=1#frag", "https://example.com/a/b?a=1&z=2"),
      ("https://example.com", "https://example.com"),
      ("https://example.com/", "https://example.com"),
      ("https://example.com/?utm_campaign=only", "https://example.com"),
      ("http://sub.Site.org/P/Q?fbclid=abc&gclid=1&b=2", "https://sub.site.org/P/Q?b=2"))
    val df = cases.zipWithIndex.map { case ((u, e), i) => (i.toLong, u, e) }
      .toDF("doc_id", "url", "expected")
    val bad = df.select(WebCuration.normalizeUrlCol(col("url")).as("got"), col("expected"))
      .where(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("urlDedupGroups collapses canonical-equal variants with a deterministic keeper") {
    val df = Seq(
      (10L, "http://www.a.com/x?utm_source=f"),
      (11L, "https://A.com/x/"),
      (12L, "https://a.com/x"),
      (20L, "https://b.com/y?p=1"),
      (21L, "https://b.com/y?p=2")).toDF("doc_id", "url")
    val groups = WebCuration.urlDedupGroups(df).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[String]("url_norm") == "https://a.com/x")
    assert(groups(0).getAs[Long]("cnt") == 3 && groups(0).getAs[Long]("keep_id") == 10L)
  }

  test("domainStats groups by registered domain with distinct-host counts and exact token sums") {
    val df = Seq(
      (1L, "https://news.site.org/a", "one two three"),
      (2L, "https://blog.site.org/b", "four five"),
      (3L, "https://www.site.org/c", "six"),
      (4L, "https://other.net/d", " seven  eight ")).toDF("doc_id", "url", "text")
    val m = WebCuration.domainStats(df).collect()
      .map(r => r.getAs[String]("domain") -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_hosts"), r.getAs[Long]("total_tokens")))).toMap
    assert(m("site.org") == ((3L, 3L, 6L))) // hosts: news.site.org, blog.site.org, site.org
    assert(m("other.net") == ((1L, 1L, 2L)))
  }

  test("domainQuota keeps top-k per registered domain by order col, dense ranks 1..k, id tie-break") {
    // hot.com has 5 docs with k=3 — the two shortest must be cut; ties on
    // n_chars resolve by ascending doc_id; cold.net keeps its single doc
    val df = Seq(
      (1L, "https://a.hot.com/1", 50L),
      (2L, "https://b.hot.com/2", 90L),
      (3L, "https://hot.com/3", 90L), // ties with 2 → doc_id 2 ranks first
      (4L, "https://www.hot.com/4", 10L),
      (5L, "https://hot.com/5", 70L),
      (6L, "https://cold.net/6", 5L)).toDF("doc_id", "url", "n_chars")
    val kept = WebCuration.domainQuota(df, k = 3).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
      .toSet
    assert(kept == Set(
      ("hot.com", 1, 2L), ("hot.com", 2, 3L), ("hot.com", 3, 5L),
      ("cold.net", 1, 6L)))
  }

  test("ccnetNormalize: accents (both unicode forms), case, digits, whitespace; idempotent") {
    val f = WebCuration.ccnetNormalize
    // precomposed é and decomposed e+́ normalize identically
    assert(f("Caf\u00e9") == "cafe" && f("Cafe\u0301") == "cafe")
    assert(f("N\u00daMERO fa\u00e7ade \u00dcber na\u00efve") == "numero facade uber naive")
    assert(f("Page 42 of 100") == "page 00 of 000")
    assert(f("  a\t b\n\nc  ") == "a b c")
    val samples = Seq("Caf\u00e9 42", "  Mixed\tCase 7 ", "plain ascii text")
    samples.foreach(s => assert(f(f(s)) == f(s), s"idempotence on '$s'"))
  }
}
