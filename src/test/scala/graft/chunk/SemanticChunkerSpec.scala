package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

class SemanticChunkerSpec extends AnyFunSuite {

  test("semantic: single sentence returns itself, empty input returns nothing") {
    val c = new SemanticChunker()
    assert(c.chunk("just one sentence no punctuation") ==
      Vector("just one sentence no punctuation"))
    assert(c.chunk("") == Vector())
  }

  test("semantic: breaks where embedding distance exceeds the percentile") {
    // controlled embeddings (buffer 0 so windows are raw sentences):
    // sentences 1-2 identical direction, sentence 3 orthogonal ->
    // distances [0, 1]; only the 1.0 distance exceeds the 0.95th percentile
    val embed: String => Array[Float] =
      s => if (s.contains("zebra")) Array(0f, 1f) else Array(1f, 0f)
    val c = new SemanticChunker(embed, bufferSize = 0)
    val out = c.chunk("alpha one. alpha two. zebra three.")
    assert(out == Vector("alpha one. alpha two.", "zebra three."))
  }

  test("semantic: homogeneous text stays one chunk (no distance above threshold)") {
    val embed: String => Array[Float] = _ => Array(1f, 0f)
    val c = new SemanticChunker(embed, bufferSize = 0)
    assert(c.chunk("a one. a two. a three.") == Vector("a one. a two. a three."))
  }

  test("semantic: langchain sentence regex splits on .?! + whitespace only") {
    val embed: String => Array[Float] = s => Array(s.length.toFloat, 1f)
    val c = new SemanticChunker(embed, bufferSize = 0)
    // "3.14 approx" must NOT split (no whitespace after the dot)
    val out = c.chunk("pi is 3.14 approximately! next sentence?")
    assert(out.mkString(" ") == "pi is 3.14 approximately! next sentence?")
  }

  test("semantic: deterministic run-over-run with the default embedder") {
    val text = ("the quick brown fox. " * 3) + "stocks fell sharply today. " +
      "markets rallied later? " + ("the quick brown fox. " * 2)
    val a = new SemanticChunker().chunk(text)
    val b = new SemanticChunker().chunk(text)
    assert(a == b)
    assert(a.mkString(" ") == text.trim)
  }

  test("markdown: splits at ATX headers, keeps preamble and section bodies") {
    val md =
      """intro text
        |# Title
        |body one
        |body two
        |## Sub section
        |body three""".stripMargin
    val out = new MarkdownChunker().chunk(md)
    assert(out == Vector(
      "intro text",
      "# Title\nbody one\nbody two",
      "## Sub section\nbody three"))
  }

  test("markdown: header-like lines inside code fences do not split") {
    val md =
      """# Doc
        |```
        |# not a header
        |## also not
        |```
        |tail""".stripMargin
    val out = new MarkdownChunker().chunk(md)
    assert(out.size == 1)
    assert(out.head.contains("# not a header"))
  }

  test("markdown: #### without space and 7+ hashes are not headers") {
    val out = new MarkdownChunker().chunk("#tag line\n####### seven\n# Real\nbody")
    assert(out == Vector("#tag line\n####### seven", "# Real\nbody"))
  }

  test("dispatch: semantic and markdown are registered") {
    assert(Chunkers.forType("semantic").isInstanceOf[SemanticChunker])
    assert(Chunkers.forType("markdown").isInstanceOf[MarkdownChunker])
  }
}
