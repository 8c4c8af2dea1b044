package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.chunk.Chunkers
import graft.functions.Normalize
import graft.model.Doc

/** K5 per-document chunker dispatch (`ecc/app/graphrag/workers.py:89-96`):
  * a mixed-ctype corpus must chunk each document with ITS chunker, and the
  * default corpus (no ctype column) must be byte-identical to the global
  * chunker path.
  */
class CtypeDispatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val mdText = "# Title\nintro line\n# Second\nbody a\nbody b"
  private val plainText = "line one\nline two\nline three"
  private val charText = "a" * 250

  test("mixed corpus dispatches per-document by ctype") {
    import spark.implicits._
    val docs = Seq(
      ("d_md", mdText, "markdown"),
      ("d_plain", plainText, null),        // null → default (regex)
      ("d_char", charText, "character"),
      ("d_up", plainText, " Markdown ")    // case/space-insensitive dispatch
    ).toDF("doc_id", "text", "ctype")

    val got = GraphAssembly.chunksByCtype(docs, defaultCtype = "regex",
      characterChunkSize = 100, characterOverlap = 0)
      .collect().groupBy(_.doc_id).map { case (k, v) =>
        k -> v.sortBy(_.idx).map(_.text).toSeq
      }

    def expect(ctype: String, text: String) =
      Chunkers.forType(ctype, 100, 0).chunk(Normalize.unicodeUnescape(text))
    assert(got("d_md") == expect("markdown", mdText))
    assert(got("d_plain") == expect("regex", plainText))
    assert(got("d_char") == expect("character", charText))
    assert(got("d_up") == expect("markdown", plainText))
    // chunk identity preserved: id = s"${doc_id}_chunk_$idx"
    val ids = GraphAssembly.chunksByCtype(docs).collect()
    assert(ids.forall(c => c.chunk_id == s"${c.doc_id}_chunk_${c.idx}"))
  }

  test("no ctype column → identical to the global default chunker path") {
    import spark.implicits._
    val docsDf = Seq(("d1", mdText), ("d2", plainText)).toDF("doc_id", "text")
    val viaDispatch = GraphAssembly.chunksByCtype(docsDf).collect().toSet
    val typed = Seq(
      Doc("d1", mdText, "en", new java.sql.Timestamp(0L)),
      Doc("d2", plainText, "en", new java.sql.Timestamp(0L))).toDS()
    val viaGlobal = GraphAssembly.chunks(typed, Chunkers.forType("regex")).collect().toSet
    assert(viaDispatch == viaGlobal)
  }
}
