package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale

/** Deterministic id / type / text normalization, semantics-exact vs the
  * reference (cited file:line below). These are pure Scala functions used
  * both inside typed maps and registered as Spark functions — keeping one
  * implementation avoids UDF-vs-test drift.
  */
object Normalize extends Serializable {

  /** Entity/type/community id sanitizer — exact port of `process_id`
    * (`/root/reference/ecc/app/graphrag/util.py:171-181`):
    *   1. `replace(" ","_").replace("/","").replace("%","percent").lower()`
    *   2. if the string matches `(.*)\(` keep group 1 (greedy — up to the
    *      LAST '(' of the first line, matching Python `re.findall` element 0)
    *   3. literal `''` or `""` → "" (callers drop empties,
    *      `workers.py:250-252`)
    *   4. strip remaining parens.
    */
  def processId(raw: String): String = {
    var v = raw
      .replace(" ", "_")
      .replace("/", "")
      .replace("%", "percent")
      .toLowerCase(Locale.ROOT)
    val m = FuncRe.findFirstMatchIn(v)
    if (m.isDefined) v = m.get.group(1)
    if (v == "''" || v == "\"\"") return ""
    v.replace("(", "").replace(")", "")
  }
  private val FuncRe = "(.*)\\(".r

  /** [[processId]] as a pure Catalyst Column (codegen'd, no UDF) — used in
    * the exploded assembly path where object deserialization would dominate.
    * Bit-for-bit equal to the Scala function (asserted by NormalizeSpec over
    * generated inputs; the same SQL form is the DuckDB oracle of
    * q_process_id).
    */
  def processIdCol(raw: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // literal single-char edits use translate/replace (no regex engine):
    // one translate maps ' '→'_' AND deletes '/'; the paren strip is a
    // second translate. Only the greedy keep-before-last-'(' rule needs a
    // real regex, and it stays behind the contains guard. This column is
    // evaluated per extracted node/edge endpoint — the hottest scalar in
    // the assembly stage (~3 sites × millions of occurrences per run).
    val s1 = lower(replace(translate(raw, " /", "_"), lit("%"), lit("percent")))
    val s2 = when(s1.contains("("), regexp_extract(s1, "(.*)\\(", 1)).otherwise(s1)
    when(s2 === "''" || s2 === "\"\"", lit(""))
      .otherwise(translate(s2, "()", ""))
  }

  /** Relation-type normalization: `replace(" ","_").upper()`
    * (`common/extractors/LLMEntityRelationshipExtractor.py:64,167`).
    */
  def relationType(raw: String): String =
    raw.replace(" ", "_").toUpperCase(Locale.ROOT)

  /** Node-type normalization: `replace(" ","_").capitalize()`
    * (`LLMEntityRelationshipExtractor.py:108,211`). Python `str.capitalize`
    * title-cases the first char and lower-cases the rest.
    */
  def nodeType(raw: String): String = {
    val s = raw.replace(" ", "_")
    if (s.isEmpty) s
    else s"${Character.toTitleCase(s.charAt(0))}${s.substring(1).toLowerCase(Locale.ROOT)}"
  }

  /** Python `text.encode('utf-8').decode('unicode_escape')` — applied to
    * stored text before chunking (`ecc/app/graphrag/workers.py:96`). The
    * encode/decode pair views the UTF-8 bytes as Latin-1 characters and
    * interprets Python string escapes (\n \t \xhh \uxxxx octal …); unknown
    * escapes keep the backslash. Deterministic part of the chunking contract.
    */
  def unicodeUnescape(s: String): String = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    @inline def at(j: Int): Char = (bytes(j) & 0xff).toChar
    @inline def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    @inline def hexVal(j: Int, n: Int): Int =
      Integer.parseInt((j until (j + n)).map(at).mkString, 16)
    var i = 0
    while (i < bytes.length) {
      val c = at(i)
      if (c == '\\' && i + 1 < bytes.length) {
        at(i + 1) match {
          case '\n' => i += 2 // line continuation — dropped
          case '\\' => sb.append('\\'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '"'  => sb.append('"'); i += 2
          case 'a'  => sb.append('\u0007'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'v'  => sb.append('\u000B'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0; var k = 0
            while (j < bytes.length && k < 3 && at(j) >= '0' && at(j) <= '7') {
              v = v * 8 + (at(j) - '0'); j += 1; k += 1
            }
            sb.append(v.toChar); i = j
          case 'x' if i + 3 < bytes.length && isHex(at(i + 2)) && isHex(at(i + 3)) =>
            sb.append(hexVal(i + 2, 2).toChar); i += 4
          case 'u' if i + 5 < bytes.length && (2 to 5).forall(k => isHex(at(i + k))) =>
            sb.append(hexVal(i + 2, 4).toChar); i += 6
          case 'U' if i + 9 < bytes.length && (2 to 9).forall(k => isHex(at(i + k))) =>
            sb.appendCodePoint(hexVal(i + 2, 8)); i += 10
          case _ => sb.append('\\'); i += 1 // unknown escape keeps backslash
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Doc-id normalization at load: lowercase, mirroring `gsql_lower`
    * (`common/gsql/supportai/SupportAI_InitialLoadJSON.gsql:3-6`).
    */
  def docId(url: String): String = url.toLowerCase(Locale.ROOT)

  /** Community-name cleanup before summarization: strip digits+underscores
    * (`ecc/app/graphrag/community_summarizer.py:36,51`, `re.sub(r"[_\d]*","")`).
    */
  def communityName(raw: String): String = raw.replaceAll("[_\\d]*", "")
}
