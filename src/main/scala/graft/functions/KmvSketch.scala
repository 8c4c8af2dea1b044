package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (bottom-k / K-Minimum-Values) sketch as a mergeable `Aggregator`:
  * keeps the k smallest DISTINCT 64-bit hashes of a set under unsigned
  * order (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for the unbiased
  * estimator). Two properties make it the right distinct/overlap sketch
  * here:
  *
  *  1. The final state is the k unsigned-smallest distinct hashes OF THE
  *     SET — a pure function of the input set, independent of partitioning
  *     and merge order (unlike Misra–Gries, whose counters are summary-
  *     dependent). Results hash-compare exactly across runs AND engines.
  *  2. With [[graft.operators.TextStats.fingerprint64]] as the hash, a SQL
  *     engine can recompute the identical sketch — the DuckDB oracle checks
  *     the actual k-min set, not just a tolerance band.
  *
  * Estimators: distinct ≈ (k−1) / r_k with r_k = U(kth)/2^64 (U = unsigned
  * value); for two sketches, Jaccard ≈ |K_k(A∪B) ∩ K_A ∩ K_B| / k — the
  * crawl-overlap estimate between two corpora without co-shuffling them.
  *
  * State is O(k) per task, merge is bounded-set union: one partial-agg
  * pass at any corpus size.
  */
object KmvSketch {

  object UnsignedLongOrdering extends Ordering[Long] with Serializable {
    override def compare(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)
  }

  /** hashes: the k unsigned-smallest distinct input hashes, unsigned-ascending. */
  case class KmvResult(hashes: Seq[Long])

  /** kept: the current k-min candidates, unsigned-sorted, distinct;
    * staging: unsorted recent inserts, compacted in batches. Plain long
    * arrays — Kryo round-trips them faithfully (a PriorityQueue buffer
    * loses its ordering on deserialization and NPEs mid-merge). */
  case class KmvBuf(var kept: Array[Long], staging: mutable.ArrayBuffer[Long])

  class Kmv(k: Int) extends Aggregator[Long, KmvBuf, KmvResult] {
    require(k >= 2, "Kmv: k must be >= 2")

    override def zero: KmvBuf = KmvBuf(Array.emptyLongArray, mutable.ArrayBuffer.empty)

    private def compact(b: KmvBuf): Unit = {
      if (b.staging.nonEmpty) {
        val merged = (b.kept ++ b.staging).sorted(UnsignedLongOrdering)
        val out = mutable.ArrayBuilder.make[Long]
        var i = 0
        var taken = 0
        while (i < merged.length && taken < k) {
          if (i == 0 || merged(i) != merged(i - 1)) { out += merged(i); taken += 1 }
          i += 1
        }
        b.kept = out.result()
        b.staging.clear()
      }
    }

    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      // saturated fast path: most of the stream is >= the current kth min
      if (b.kept.length < k ||
          java.lang.Long.compareUnsigned(h, b.kept(b.kept.length - 1)) < 0) {
        b.staging += h
        if (b.staging.size >= 4096) compact(b)
      }
      b
    }

    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      a.staging ++= b.kept
      a.staging ++= b.staging
      compact(a)
      a
    }

    override def finish(b: KmvBuf): KmvResult = { compact(b); KmvResult(b.kept.toSeq) }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /** Column aggregate over pre-hashed longs:
    * `df.agg(KmvSketch.kmv(1024)(TextStats.fingerprintCol(col("g"))))`. */
  def kmv(k: Int): Column => Column = {
    val fn = udaf(new Kmv(k), Encoders.scalaLong)
    (c: Column) => fn(c)
  }

  /** Unbiased distinct estimate from a sketch of capacity k: exact when the
    * sketch is unsaturated, (k−1)/r_k otherwise. */
  def estimateDistinct(k: Int, hashes: Seq[Long]): Double =
    if (hashes.size < k) hashes.size.toDouble
    else (k - 1).toDouble * 18446744073709551616.0 / unsignedToDouble(hashes.last)

  /** Jaccard estimate between two sketches of the same capacity k. */
  def estimateJaccard(k: Int, a: Seq[Long], b: Seq[Long]): Double = {
    val union = (a ++ b).distinct.sorted(UnsignedLongOrdering).take(k)
    if (union.isEmpty) 0.0
    else {
      val sa = a.toSet; val sb = b.toSet
      union.count(h => sa(h) && sb(h)).toDouble / union.size
    }
  }

  def unsignedToDouble(h: Long): Double =
    if (h >= 0L) h.toDouble else h.toDouble + 18446744073709551616.0
}
