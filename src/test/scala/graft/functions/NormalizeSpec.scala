package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Vectors derived from the reference implementations (FIXTURES.md §3):
  * `process_id` — /root/reference/ecc/app/graphrag/util.py:171-181,
  * relation/node type — LLMEntityRelationshipExtractor.py:64,108,
  * unicode_escape — ecc/app/graphrag/workers.py:96.
  */
class NormalizeSpec extends AnyFunSuite {

  test("processIdCol is bit-identical to processId over generated inputs") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(99)
    val alphabet = "abXY Z/%()'\"_.-0"
    val cases = Seq("", "''", "\"\"", "a(b)c", "x (y(z)", "A/B% (C)", "(", ")", "((",
      "no specials", "Tail(", "(lead") ++
      (0 until 500).map(_ => (0 until rng.nextInt(12)).map(_ =>
        alphabet(rng.nextInt(alphabet.length))).mkString)
    val out = cases.toDF("raw")
      .select(col("raw"), graft.functions.Normalize.processIdCol(col("raw")).as("c"))
      .collect()
    out.foreach { r =>
      val raw = r.getString(0)
      assert(r.getString(1) == Normalize.processId(raw),
        s"mismatch for <$raw>: col=${r.getString(1)} fn=${Normalize.processId(raw)}")
    }
  }


  test("processId basic replacement chain") {
    assert(Normalize.processId("Jumping Jacks") == "jumping_jacks")
    assert(Normalize.processId("A/B%") == "abpercent")
    assert(Normalize.processId("Vincent van Gogh") == "vincent_van_gogh")
  }

  test("processId function-call form keeps greedy group before last paren") {
    assert(Normalize.processId("foo(bar)") == "foo")
    // greedy (.*)\( → group is everything before the LAST '(' — parens stripped after
    assert(Normalize.processId("a(b(c") == "ab")
    assert(Normalize.processId("noparens") == "noparens")
  }

  test("processId quote-pair sentinels drop to empty") {
    assert(Normalize.processId("''") == "")
    assert(Normalize.processId("\"\"") == "")
  }

  test("processId strips residual parens") {
    assert(Normalize.processId(")weird") == "weird")
  }

  test("processId is idempotent") {
    for (s <- Seq("Jumping Jacks", "A/B%", "foo(bar)", "x y z", "The Talor Group")) {
      val once = Normalize.processId(s)
      assert(Normalize.processId(once) == once)
    }
  }

  test("relationType") {
    assert(Normalize.relationType("works at") == "WORKS_AT")
    assert(Normalize.relationType("is located in") == "IS_LOCATED_IN")
  }

  test("nodeType = python str.capitalize after underscore join") {
    assert(Normalize.nodeType("person type") == "Person_type")
    assert(Normalize.nodeType("ORGANIZATION") == "Organization")
    assert(Normalize.nodeType("") == "")
  }

  test("unicodeUnescape handles python escape sequences") {
    assert(Normalize.unicodeUnescape("line1\\nline2") == "line1\nline2")
    assert(Normalize.unicodeUnescape("tab\\there") == "tab\there")
    assert(Normalize.unicodeUnescape("a\\x41b") == "aAb")
    assert(Normalize.unicodeUnescape("u\\u0041v") == "uAv")
    assert(Normalize.unicodeUnescape("oct\\101x") == "octAx")
    assert(Normalize.unicodeUnescape("keep\\qthis") == "keep\\qthis") // unknown escape
    assert(Normalize.unicodeUnescape("plain text") == "plain text")
  }

  test("unicodeUnescape views utf-8 bytes as latin-1 (python decode parity)") {
    // Python: "é".encode('utf-8').decode('unicode_escape') == 'Ã©'
    assert(Normalize.unicodeUnescape("é") == "Ã©")
  }

  test("docId lowers") {
    assert(Normalize.docId("https://X.example.org/Page-1") == "https://x.example.org/page-1")
  }

  test("communityName strips digits and underscores") {
    assert(Normalize.communityName("comm_12_3") == "comm")
  }
}
