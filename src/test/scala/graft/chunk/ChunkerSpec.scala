package graft.chunk

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors ported verbatim from the reference's own unit tests
  * (`/root/reference/graphrag/tests/test_character_chunker.py:6-66`,
  * `test_regex_chunker.py:6-32`) plus reassembly/coverage properties over
  * seeded random inputs.
  */
class ChunkerSpec extends AnyFunSuite {

  test("character: without overlap") {
    assert(new CharacterChunker(4).chunk("abcdefghijkl") == Vector("abcd", "efgh", "ijkl"))
  }

  test("character: with overlap") {
    assert(new CharacterChunker(4, 2).chunk("abcdefghijkl") ==
      Vector("abcd", "cdef", "efgh", "ghij", "ijkl"))
  }

  test("character: with overlap and uneven tail") {
    assert(new CharacterChunker(4, 2).chunk("abcdefghijklm") ==
      Vector("abcd", "cdef", "efgh", "ghij", "ijkl", "klm"))
  }

  test("character: empty input") {
    assert(new CharacterChunker(4, 2).chunk("") == Vector.empty)
  }

  test("character: input shorter than chunk size") {
    assert(new CharacterChunker(10).chunk("abc") == Vector("abc"))
  }

  test("character: last chunk shorter than chunk size (trailing sliver dropped)") {
    assert(new CharacterChunker(4, 1).chunk("abcdefghijklm") ==
      Vector("abcd", "defg", "ghij", "jklm"))
  }

  test("character: chunk_size == overlap raises") {
    intercept[IllegalArgumentException](new CharacterChunker(4, 4))
  }

  test("character: overlap larger than chunk raises") {
    intercept[IllegalArgumentException](new CharacterChunker(3, 4))
  }

  test("character: zero / negative chunk size raises") {
    intercept[IllegalArgumentException](new CharacterChunker(0, 0))
    intercept[IllegalArgumentException](new CharacterChunker(-1))
  }

  test("regex: splits and drops empties (reference default pattern)") {
    val c = new RegexChunker("\\r?\\n")
    assert(c.chunk("a\nb\r\n\nc") == Vector("a", "b", "c"))
    assert(c.chunk("") == Vector.empty)
    assert(c.chunk("no newline") == Vector("no newline"))
  }

  test("regex: punctuation split") {
    val c = new RegexChunker("[,.!?]\\s*")
    assert(c.chunk("Hi. There, you!") == Vector("Hi", "There", "you"))
  }

  private def cases(n: Int): Seq[(String, Int, Int)] = {
    val rng = new Random(42)
    (0 until n).map { _ =>
      val s = rng.alphanumeric.take(rng.nextInt(60)).mkString
      val size = 2 + rng.nextInt(10)
      val ov = rng.nextInt(size) // always < size
      (s, size, ov)
    }
  }

  test("property: chunks with overlap o reassemble the prefix they cover") {
    for ((s, size, ov) <- cases(500)) {
      val chunks = new CharacterChunker(size, ov).chunk(s)
      if (s.isEmpty) assert(chunks.isEmpty)
      else {
        // dropping the first `ov` chars of every chunk after the first
        // reconstructs a prefix of s; the un-covered tail is < size
        val joined = (chunks.headOption.toList ++ chunks.drop(1).map(_.drop(ov))).mkString
        assert(s.startsWith(joined), s"input=$s size=$size ov=$ov chunks=$chunks")
        assert(s.length - joined.length < size)
      }
    }
  }

  test("property: every chunk is a substring at its expected offset") {
    for ((s, size, ov) <- cases(500)) {
      val step = size - ov
      val chunks = new CharacterChunker(size, ov).chunk(s)
      chunks.zipWithIndex.foreach { case (c, k) =>
        assert(s.substring(k * step, math.min(s.length, k * step + size)) == c)
      }
    }
  }
}
