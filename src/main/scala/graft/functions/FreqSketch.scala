package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch as a mergeable Spark `Aggregator` — the
  * bounded-memory path for frequency estimation when the exact
  * `groupBy(token).count` output itself is too large to shuffle (100 TB
  * corpora have billions of distinct tokens; the sketch keeps `k` counters
  * per partition and merges associatively, so the job is one partial-agg
  * pass with O(k) state per task — the same shape as HLL/GK, which Spark
  * ships, for the frequency moment, which it does not).
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with capacity k over N items,
  *   est(x) ≤ true(x) ≤ est(x) + err
  * where `err` is the tracked total decrement, err ≤ N/(k+1) under ANY
  * reduce/merge order — so every item with true(x) > N/(k+1) is guaranteed
  * present. The support set and exact estimates MAY vary with partitioning;
  * the guarantees may not. Gate queries therefore pin the guaranteed
  * booleans, never the raw counters.
  */
object FreqSketch {

  /** items: surviving counters (token → lower-bound estimate);
    * err: total decremented mass — the uniform upper bound on
    * true(x) − est(x) for every x (present or evicted). */
  case class MgResult(items: Map[String, Long], err: Long)

  case class MgBuf(items: mutable.Map[String, Long], var err: Long)

  class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgResult] {
    require(k >= 1, "MisraGries: k must be >= 1")

    override def zero: MgBuf = MgBuf(mutable.Map.empty, 0L)

    override def reduce(b: MgBuf, x: String): MgBuf = {
      if (x == null) return b
      val cur = b.items.getOrElse(x, 0L)
      if (cur > 0L || b.items.size < k) b.items.update(x, cur + 1L)
      else {
        // decrement-all step: one unit of every counter AND of x cancel out
        b.err += 1L
        val dead = b.items.iterator.collect { case (t, 1L) => t }.toList
        b.items.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(b.items.remove)
      }
      b
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      b.items.foreach { case (t, c) => a.items.update(t, a.items.getOrElse(t, 0L) + c) }
      a.err += b.err
      if (a.items.size > k) {
        // subtract the (k+1)-th largest count from everything, drop <= 0:
        // the minimal uniform decrement that restores |items| <= k
        val cut = a.items.values.toArray.sortInPlaceWith(_ > _).apply(k)
        a.err += cut
        val dead = a.items.iterator.collect { case (t, c) if c <= cut => t }.toList
        dead.foreach(a.items.remove)
        a.items.mapValuesInPlace((_, c) => c - cut)
      }
      a
    }

    override def finish(b: MgBuf): MgResult = MgResult(b.items.toMap, b.err)

    override def bufferEncoder: Encoder[MgBuf] = Encoders.kryo[MgBuf]
    override def outputEncoder: Encoder[MgResult] = Encoders.product[MgResult]
  }

  /** Column aggregate: `df.agg(FreqSketch.misraGries(64)(col("token")))`. */
  def misraGries(k: Int): Column => Column = {
    val fn = udaf(new MisraGries(k), Encoders.STRING)
    (c: Column) => fn(c)
  }
}
