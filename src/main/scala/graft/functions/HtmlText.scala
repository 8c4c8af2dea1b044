package graft.functions

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction.
  *
  * New surface defined by the north rule (the reference ingests pre-extracted
  * text; it has no HTML parser — SURVEY.md §1.3). Contract: for every input
  * row, `extract(html) == text` byte-identically, run-over-run.
  *
  * Semantics (single pass, no DOM):
  *   - decode bytes as UTF-8
  *   - drop `<script>…</script>`, `<style>…</style>` including content
  *   - drop comments `<!-- … -->` and `<!DOCTYPE …>`
  *   - block-level close tags (`p, div, h1..h6, li, br, title, tr`) emit '\n'
  *   - every other tag is deleted
  *   - entities `&amp; &lt; &gt; &quot; &#39; &nbsp;` and numeric `&#NNN;`
  *     are decoded
  *   - runs of spaces/tabs collapse to one space; spaces around newlines are
  *     trimmed; runs of newlines collapse to one; leading/trailing whitespace
  *     stripped.
  */
object HtmlText extends Serializable {

  def extract(html: Array[Byte]): String =
    extractFromString(new String(html, StandardCharsets.UTF_8))

  def extractFromString(html: String): String = {
    val raw = new java.lang.StringBuilder(html.length)
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val lower = lowerAhead(html, i, 9)
        if (lower.startsWith("<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lower.startsWith("<script")) {
          i = skipElement(html, i, "</script")
        } else if (lower.startsWith("<style")) {
          i = skipElement(html, i, "</style")
        } else {
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val tag = html.substring(i + 1, end).trim.toLowerCase
            if (isBlockClose(tag)) raw.append('\n')
            i = end + 1
          }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        raw.append(decoded)
        i = next
      } else { raw.append(c); i = next(i) }
    }
    collapseWhitespace(raw.toString)
  }

  @inline private def next(i: Int): Int = i + 1

  private def lowerAhead(s: String, i: Int, k: Int): String =
    s.substring(i, math.min(s.length, i + k)).toLowerCase

  /** Skip from the element open tag past its matching close tag.
    * Case-insensitive scan via regionMatches — the earlier `s.toLowerCase`
    * allocated a full copy of the document per script/style occurrence,
    * O(n²) on script-heavy real-web pages.
    */
  private def skipElement(s: String, i: Int, closePrefix: String): Int = {
    val n = s.length
    val m = closePrefix.length
    var j = i
    while (j <= n - m) {
      if (s.regionMatches(true, j, closePrefix, 0, m)) {
        val gt = s.indexOf('>', j)
        return if (gt < 0) n else gt + 1
      }
      j += 1
    }
    n
  }

  private val BlockTags =
    Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "title", "tr")

  private def isBlockClose(tag: String): Boolean = {
    if (tag.startsWith("/")) BlockTags.contains(tag.drop(1).trim)
    else tag.takeWhile(ch => ch != ' ' && ch != '/') match {
      case "br" => true
      case _    => false
    }
  }

  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i)
    if (semi < 0 || semi - i > 8) return ("&", i + 1)
    s.substring(i + 1, semi) match {
      case "amp"  => ("&", semi + 1)
      case "lt"   => ("<", semi + 1)
      case "gt"   => (">", semi + 1)
      case "quot" => ("\"", semi + 1)
      case "nbsp" => (" ", semi + 1)
      case e if e.startsWith("#") && e.drop(1).nonEmpty && e.drop(1).forall(_.isDigit) =>
        (new String(Character.toChars(e.drop(1).toInt)), semi + 1)
      case _ => ("&", i + 1)
    }
  }

  private def collapseWhitespace(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNewline = false
    var started = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { pendingNewline = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\r') { pendingSpace = true }
      else {
        if (started) {
          if (pendingNewline) sb.append('\n')
          else if (pendingSpace) sb.append(' ')
        }
        pendingNewline = false; pendingSpace = false
        sb.append(c); started = true
      }
      i += 1
    }
    sb.toString
  }
}
