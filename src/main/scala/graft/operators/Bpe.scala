package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding over a corpus
  * (Sennrich et al. 2016, arXiv:1508.07909) — the step a training-data
  * pipeline runs between curation and packing: learn the merge table on the
  * cleaned corpus, then encode every document with it.
  *
  * Shape (the standard trainer decomposition, same as HuggingFace
  * tokenizers' word-count front end): the corpus reduces to its word
  * frequency table DISTRIBUTED — one partial-agg shuffle whose map-side
  * combine absorbs Zipf-hot words, output bounded by the vocabulary (Heaps'
  * law), not the corpus — then merge learning runs on the top-`maxWords`
  * slice in driver memory, which is exact for any corpus whose tail words
  * are rarer than the cut (the slice is taken by (freq desc, word), so the
  * discarded tail can never contain a pair that outcounts the head at
  * realistic maxWords). Encoding is a narrow map with the learned ranks
  * broadcast and a per-partition word→pieces memo (Zipf makes the cache hit
  * rate ≈ 1).
  *
  * Determinism contract (everything is integer counts — no float anywhere):
  * word counts are exact longs; the maxWords cut orders by (freq desc,
  * word); each merge picks max by (pair count, then lexicographically
  * SMALLEST (left, right)); encoding applies merges by rank. Identical on
  * any partitioning, any engine.
  */
object Bpe {

  /** Exact word-frequency table: lowercase, whitespace-split (the repo's
    * tokenization convention — TextStats.tokenCountCol). One shuffle.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        w => w =!= lit(""))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** One learned merge: rank r replaced adjacent symbol pair (left, right)
    * with left+right.
    */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn up to `nMerges` merges from a corpus. Distributed word count →
    * driver-side merge loop on the bounded top-`maxWords` table (collected
    * via TakeOrderedAndProject, never a global sort). Stops early when no
    * pair occurs twice.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 65536): Seq[Merge] = {
    val top = wordCounts(df, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(top.toIndexedSeq, nMerges)
  }

  /** The merge-learning loop on an in-memory word-frequency table. Exposed
    * for spec vectors. Maintains pair counts and a pair→words-containing-it
    * index so each merge touches only affected words.
    */
  def trainFromWordCounts(wc: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    // each word as its symbol sequence (unicode code points as initial
    // symbols; supplementary planes kept whole)
    val words: Array[mutable.ArrayBuffer[String]] = wc.map { case (w, _) =>
      val b = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b
    }.toArray
    val freqs = wc.map(_._2).toArray
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val occurs = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = words(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(wi)
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (sign > 0) occurs.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val out = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // max by (count, then lexicographically smallest pair): one linear
      // scan of the live pairs — bounded by vocabulary size, not corpus
      var best: (String, String) = null
      var bestC = 1L // require count >= 2: merging singletons is noise
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        out += Merge(rank, best._1, best._2)
        val joined = best._1 + best._2
        val affected = occurs.getOrElse(best, mutable.BitSet.empty).toArray
        affected.foreach { wi =>
          val s = words(wi)
          if (s.length >= 2) {
            addWord(wi, -1L) // retract this word's old pair contributions
            var i = 0
            while (i < s.length - 1) {
              if (s(i) == best._1 && s(i + 1) == best._2) {
                s(i) = joined; s.remove(i + 1)
              } else i += 1
            }
            addWord(wi, 1L) // re-add with the merge applied
          }
        }
        occurs.remove(best)
        rank += 1
      }
    }
    out.result()
  }

  /** Encode one word with a learned merge table: repeatedly apply the
    * lowest-rank applicable merge (the standard BPE encode order).
    */
  def segmentWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    val s = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      s += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    var go = s.length >= 2
    while (go) {
      var bi = -1
      var br = Int.MaxValue
      var j = 0
      while (j < s.length - 1) {
        val r = ranks.getOrElse((s(j), s(j + 1)), Int.MaxValue)
        if (r < br) { br = r; bi = j }
        j += 1
      }
      if (bi < 0) go = false
      else {
        s(bi) = s(bi) + s(bi + 1)
        s.remove(bi + 1)
        if (s.length < 2) go = false
      }
    }
    s.toVector
  }

  /** Distributed encode: (id, n_words, n_pieces) per document. The rank map
    * is broadcast; each partition memoizes word→piece-count (Zipf: most
    * lookups hit). Narrow — zero shuffles.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val pieceCount = udf { (text: String) =>
      val r = bc.value
      val memo = mutable.HashMap.empty[String, Int]
      val words = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      var pieces = 0L
      var nw = 0L
      words.foreach { w =>
        pieces += memo.getOrElseUpdate(w, segmentWord(w, r).length)
        nw += 1
      }
      (nw, pieces)
    }
    df.select(col(idCol), pieceCount(col(textCol)).as("t"))
      .select(col(idCol), col("t._1").as("n_words"), col("t._2").as("n_pieces"))
  }
}
