package graft.chunk

import graft.extract.HashEmbedder

/** Deterministic realization of the reference's DEFAULT chunker
  * (`common/config.py:95-96` selects `semantic`;
  * `common/chunkers/semantic_chunker.py:22-56` delegates to LangChain's
  * `SemanticChunker`). The LangChain algorithm is reproduced exactly —
  * sentence split on `(?<=[.?!])\s+`, ±buffer window combine, embedding
  * cosine distance between adjacent windows, breakpoints above the
  * percentile threshold (numpy linear interpolation), groups joined with a
  * space — with the provider embedding service swapped for the injectable
  * `embed` function (our deterministic [[graft.extract.HashEmbedder]] by
  * default), which is the same substitution the rest of the pipeline makes
  * for provider models.
  *
  * @param embed sentence-window embedder
  * @param bufferSize sentences of context on each side when embedding
  *                   (LangChain default 1)
  * @param breakpointPercentile percentile (0–100 scale) of the distance
  *        distribution above which a boundary is cut. The reference passes
  *        `breakpoint_threshold_amount=0.95` (`semantic_chunker.py:28`) —
  *        on LangChain's 0–100 percentile scale, i.e. nearly every
  *        above-minimum distance splits — so 0.95 is kept as the faithful
  *        default.
  */
final class SemanticChunker(
    embed: String => Array[Float],
    val bufferSize: Int = 1,
    val breakpointPercentile: Double = 0.95) extends Chunker {

  def this() = this(new HashEmbedder(256, 42).embed(_))

  override def chunk(input: String): IndexedSeq[String] = {
    // langchain text_splitter.py: re.split(r"(?<=[.?!])\s+", text)
    val sentences = input.split("(?<=[.?!])\\s+").toIndexedSeq
    if (sentences.length <= 1) return sentences.filter(_.nonEmpty)

    // combine each sentence with its ±buffer neighbors, embed, distance to next
    val combined = sentences.indices.map { i =>
      val lo = math.max(0, i - bufferSize)
      val hi = math.min(sentences.length - 1, i + bufferSize)
      (lo to hi).map(sentences).mkString(" ")
    }
    val embs = combined.map(embed)
    val distances = (0 until sentences.length - 1).map { i =>
      1.0 - graft.extract.VectorOps.cosine(embs(i), embs(i + 1))
    }

    val threshold = percentileLinear(distances, breakpointPercentile)
    val breakIdx = distances.indices.filter(distances(_) > threshold)

    val out = Vector.newBuilder[String]
    var start = 0
    for (idx <- breakIdx) {
      out += sentences.slice(start, idx + 1).mkString(" ")
      start = idx + 1
    }
    if (start < sentences.length) out += sentences.slice(start, sentences.length).mkString(" ")
    out.result().filter(_.nonEmpty)
  }

  /** numpy.percentile with the default linear interpolation. */
  private def percentileLinear(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    if (s.length == 1) return s.head
    val pos = (s.length - 1) * (q / 100.0)
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (pos - lo) * (s(hi) - s(lo))
  }
}

/** Deterministic markdown section chunker (reference K4,
  * `common/chunkers/markdown_chunker.py:18-36`, which delegates to
  * LangChain's ExperimentalMarkdownSyntaxTextSplitter). Splits at ATX
  * header lines (`#{1,6} `) outside fenced code blocks; each chunk is a
  * header with its section body, the preamble before the first header is
  * its own chunk, and fenced code stays atomic inside its section. (The
  * LangChain splitter additionally emits code fences as separate chunks
  * with language metadata — folded into the section here, the metadata
  * channel being out of deterministic scope.)
  */
final class MarkdownChunker extends Chunker {
  override def chunk(input: String): IndexedSeq[String] = {
    val lines = input.split("\n", -1)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inFence = false

    def flush(): Unit = {
      val s = cur.result().stripLineEnd
      if (s.trim.nonEmpty) out += s
      cur.clear()
    }

    for (line <- lines) {
      val t = line.trim
      if (t.startsWith("```") || t.startsWith("~~~")) inFence = !inFence
      val isHeader = !inFence && t.startsWith("#") &&
        t.takeWhile(_ == '#').length <= 6 &&
        (t.length == t.takeWhile(_ == '#').length ||
          t.charAt(t.takeWhile(_ == '#').length) == ' ')
      if (isHeader) flush()
      cur.append(line).append('\n')
    }
    flush()
    out.result()
  }
}
