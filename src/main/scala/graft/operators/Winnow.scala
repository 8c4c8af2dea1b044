package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, SIGMOD'03
  * — the MOSS algorithm): from each document's k-token shingle stream,
  * select the minimum-hash shingle of every w-length window. The selected
  * set is a provably bounded sample — density ≈ 2/(w+1) — with the winnowing
  * guarantee: any shared substring of ≥ w+k−1 tokens between two documents
  * yields at least one SHARED selected fingerprint. That makes it the
  * principled shrink-the-shuffle step for cross-doc duplicate detection at
  * 100 TB: where `Dedup.substringDupStats` shuffles EVERY duplicated window,
  * winnowed pair-finding shuffles only the ~2/(w+1) selected fraction, with
  * no loss of ≥(w+k−1)-token matches.
  *
  * Selection is the STATELESS form — a shingle is selected iff it is the
  * minimum of at least one full window, ties on equal hash broken toward the
  * rightmost position (Schleimer §5's robust-winnowing tie rule without the
  * history dependence) — so the selected set is a pure per-document function,
  * independent of partitioning, and exactly replicable by a windowed-min in
  * SQL (the q_winnow / q_winnow_pairs DuckDB oracles recompute it
  * shingle-for-shingle, including the FNV-1a hashes).
  *
  * Everything here is per-row (narrow, zero shuffles) until the caller joins
  * the exploded fingerprints; hashes ride [[TextStats.fingerprint64]] so the
  * normalization (lowercase, whitespace-collapse) matches the rest of the
  * dedup family.
  */
object Winnow {

  /** Per-document stateless winnowing. Returns selected (gramPos, fp) pairs
    * in position order; documents shorter than k tokens select nothing;
    * documents with fewer than w shingles are treated as one window (so any
    * doc with ≥ 1 shingle yields ≥ 1 fingerprint). O(nGrams) via a monotonic
    * deque — the textbook sliding-window minimum.
    */
  def select(text: String, k: Int, w: Int): Array[(Int, Long)] = {
    require(k >= 1 && w >= 1, "Winnow: k and w must be >= 1")
    val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val g = tk.length - k + 1
    if (g <= 0) return Array.empty
    // The 2^20 bound exists only for the oracle's hu*2^20+pos key packing.
    // A single pathological web document (>2^20+k−1 tokens ≈ 4 MB of text)
    // must DEGRADE — select nothing, visible to callers as n_selected=0
    // with a huge n_grams — not throw inside an executor and fail the job.
    if (g >= (1 << 20)) return Array.empty
    val h = new Array[Long](g)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < g) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tk(i + j))
        j += 1
      }
      h(i) = TextStats.fingerprint64(sb.toString)
      i += 1
    }
    // key order: unsigned hash ascending, then position DESCENDING (rightmost
    // minimal hash wins a tie) — matches the oracle's hu*2^20 + (2^20-1-pos)
    @inline def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(h(a), h(b))
      c < 0 || (c == 0 && a > b)
    }
    val ww = math.min(w, g)
    val deque = new Array[Int](g); var head = 0; var tail = 0 // indices, keys increasing
    val out = ArrayBuffer.empty[Int]
    var last = -1
    i = 0
    while (i < g) {
      while (tail > head && less(i, deque(tail - 1))) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - ww) head += 1
      if (i >= ww - 1 && deque(head) != last) { last = deque(head); out += last }
      i += 1
    }
    out.map(p => (p, h(p))).toArray
  }

  /** Number of k-shingles of a document under the same tokenization. */
  def nGrams(text: String, k: Int): Int =
    math.max(text.trim.toLowerCase.split("\\s+").count(_.nonEmpty) - k + 1, 0)

  private def selectUdf(k: Int, w: Int): UserDefinedFunction =
    udf((text: String) =>
      if (text == null) Array.empty[Long] else select(text, k, w).map(_._2))

  private def statsUdf(k: Int, w: Int): UserDefinedFunction =
    udf((text: String) => {
      if (text == null) (0, Array.empty[Long])
      else (nGrams(text, k), select(text, k, w).map(_._2))
    })

  /** Per-document winnowing stats — one narrow pass, no shuffle:
    * (id, n_grams, n_selected, digest, density) where digest is the exact
    * decimal sum of the selected signed fingerprints (order-free, so it
    * hash-compares across engines) and density ≈ 2/(w+1) is the winnowing
    * sample rate actually achieved.
    */
  def stats(df: DataFrame, k: Int = 4, w: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol), statsUdf(k, w)(col(textCol)).as("s"))
      .select(col(idCol),
        col("s._1").cast("long").as("n_grams"),
        size(col("s._2")).cast("long").as("n_selected"),
        expr("CAST(aggregate(s._2, CAST(0 AS DECIMAL(38,0)), (a, x) -> a + CAST(x AS DECIMAL(38,0))) AS STRING)")
          .as("digest"),
        round(when(col("s._1") > 0,
          size(col("s._2")).cast("double") / col("s._1").cast("double"))
          .otherwise(lit(0.0)), 6).as("density"))

  /** Exploded (id, fp) selected-fingerprint rows, distinct per document —
    * the join key stream for [[pairs]]. Narrow until the caller shuffles. */
  def fingerprints(df: DataFrame, k: Int = 4, w: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol).cast("string").as("id"),
        explode(selectUdf(k, w)(col(textCol))).as("fp"))
      .distinct()

  /** Document pairs sharing ≥ minShared selected fingerprints — same
    * inverted-index shape as [[Dedup.ngramJaccardPairs]] but over the
    * winnowed sample, so the index shuffles ≈2/(w+1) of the shingle stream
    * instead of all of it while still guaranteeing a hit for every shared
    * run of ≥ w+k−1 tokens. `maxDocFreq` drops boilerplate fingerprints
    * present in more than that many documents BEFORE the pair join
    * (mirrored exactly in the oracle SQL, so the gate compares the capped
    * semantics, not an approximation of an uncapped one).
    * Output: (a, b, shared) with a < b (string order, ids cast to string).
    */
  def pairs(df: DataFrame, k: Int = 4, w: Int = 5, minShared: Int = 2,
      maxDocFreq: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fps = fingerprints(df, k, w, idCol, textCol)
    val filtered = fps
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .where(col("df") <= maxDocFreq)
      .select(col("id"), col("fp"))
    filtered.as("x").join(filtered.as("y"), "fp")
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }
}
