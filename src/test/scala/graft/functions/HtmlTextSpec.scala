package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusSynth

class HtmlTextSpec extends AnyFunSuite {

  test("strips tags, scripts, styles, comments; decodes entities") {
    val html =
      """<!DOCTYPE html><html><head><title>T</title><script>var x="<p>";</script>""" +
        """<style>p{color:red}</style></head><body><!-- note --><h1>Head</h1>""" +
        """<p>a &amp; b &lt;c&gt;</p><p>x&#65;y</p></body></html>"""
    assert(HtmlText.extractFromString(html) == "T\nHead\na & b <c>\nxAy")
  }

  test("collapses whitespace and newline runs") {
    val html = "<body><p>a   b</p>\n\n<p>  c  </p></body>"
    assert(HtmlText.extractFromString(html) == "a b\nc")
  }

  test("br emits newline; inline tags vanish") {
    assert(HtmlText.extractFromString("x<br/>y<b>z</b>") == "x\ny z".replace(" ", ""))
  }

  test("byte-identity invariant over the synthesized corpus (per-row oracle)") {
    val cfg = CorpusSynth.Config(nPages = 200, nClusters = 16)
    (0L until 200L).foreach { i =>
      val t = CorpusSynth.renderPage(cfg, i)
      val got = HtmlText.extract(t.page.html)
      assert(got == t.page.text, s"url=${t.page.url} mismatch")
    }
  }

  test("extraction is deterministic run-over-run") {
    val cfg = CorpusSynth.Config(nPages = 20)
    (0L until 20L).foreach { i =>
      val a = CorpusSynth.renderPage(cfg, i)
      val b = CorpusSynth.renderPage(cfg, i)
      assert(java.util.Arrays.equals(a.page.html, b.page.html))
      assert(a.page.text == b.page.text)
      assert(HtmlText.extract(a.page.html) == HtmlText.extract(b.page.html))
    }
  }
}
