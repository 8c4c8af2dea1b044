package graft.chunk

import java.util.regex.Pattern

/** Chunker interface (reference `common/chunkers/base_chunker.py`). Pure,
  * deterministic, serializable — used inside `flatMap` on `Dataset[Doc]`.
  */
trait Chunker extends Serializable {
  def chunk(input: String): IndexedSeq[String]
}

/** Exact port of `common/chunkers/character_chunker.py:4-27`: windows of
  * `chunkSize` stepping `chunkSize - overlapSize`, with the reference's loop
  * break `if i + overlap_size >= len(input): break` taken AFTER the step —
  * so a trailing sliver shorter than the overlap is dropped (see expected
  * outputs in `graphrag/tests/test_character_chunker.py:20-25,41-46`).
  * Construction requires `chunkSize > overlapSize` (ValueError parity).
  */
final class CharacterChunker(val chunkSize: Int, val overlapSize: Int = 0) extends Chunker {
  require(chunkSize > overlapSize, "Chunk size must be larger than overlap size")

  override def chunk(input: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    val step = chunkSize - overlapSize
    var i = 0
    var break = false
    while (i < input.length && !break) {
      out += input.substring(i, math.min(input.length, i + chunkSize))
      i += step
      if (i + overlapSize >= input.length) break = true
    }
    out.result()
  }
}

/** Exact port of `common/chunkers/regex_chunker.py:6-19`: `re.split(pattern)`
  * with empty strings dropped (`filter(None, res)`). The reference's default
  * pattern is `\r?\n` (`ecc/app/ecc_util.py:25-28`). `Pattern.split(s, -1)`
  * keeps trailing empties so the post-filter semantics match Python exactly.
  */
final class RegexChunker(patternStr: String) extends Chunker {
  @transient private lazy val pattern: Pattern = Pattern.compile(patternStr)

  override def chunk(input: String): IndexedSeq[String] =
    pattern.split(input, -1).iterator.filter(_.nonEmpty).toVector
}

object Chunkers {
  /** Reference default regex pattern (`ecc/app/ecc_util.py:25-28`). */
  val DefaultRegexPattern = "\\r?\\n"

  /** Chunker dispatch by document ctype (`ecc/app/ecc_util.py:15-42`,
    * `workers.py:89-96`). `semantic` (the reference's own default,
    * `common/config.py:95-96`) runs the LangChain breakpoint algorithm over
    * the deterministic hash embedder; `markdown` is the header-section
    * splitter; anything else falls back to the regex chunker on the
    * reference's default newline pattern.
    */
  def forType(ctype: String, characterChunkSize: Int = 1024, overlap: Int = 0): Chunker =
    ctype.toLowerCase.trim match {
      case "character" => new CharacterChunker(characterChunkSize, overlap)
      case "semantic"  => new SemanticChunker()
      case "markdown"  => new MarkdownChunker()
      case _           => new RegexChunker(DefaultRegexPattern)
    }
}
