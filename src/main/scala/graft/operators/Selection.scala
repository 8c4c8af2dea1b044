package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics by value bisection — the kth smallest of an
  * integer-valued column in O(log valueRange) COUNT passes, with no global
  * sort and no single-node tail. At 10^12 rows `orderBy().limit(k)` funnels
  * a whole sorted prefix through one task and `percentile_approx`/GK
  * (q_sketch_gate) gives bounded error, not exactness; bisection gives the
  * EXACT answer with ~40 pushdown-friendly partial-agg scans: count(x ≤
  * mid) halves the candidate value interval each pass (classic distributed
  * selection — Blum et al.'s selection bound meets MapReduce folklore).
  * For repeated quantile queries at scale, cache/persist the projected
  * column once; each pass then reads the in-memory column vector.
  */
object Selection {

  /** kth smallest (1-based) of `value` over non-null rows; duplicates
    * count with multiplicity (the kth of [5,5,7] at k=2 is 5). The value
    * expression must be integral (cast to long).
    */
  def exactKth(df: DataFrame, value: Column, k: Long): Long = {
    require(k >= 1, s"exactKth: k must be >= 1, got $k")
    val d = df.select(value.cast("long").as("v")).where(col("v").isNotNull)
    val head = d.agg(min(col("v")), max(col("v")), count(lit(1))).collect().head
    val n = head.getLong(2)
    require(n >= k, s"exactKth: k=$k exceeds non-null row count $n")
    var lo = head.getLong(0)
    var hi = head.getLong(1)
    // invariant: the kth smallest lies in [lo, hi]
    while (lo < hi) {
      // overflow-safe floor((lo+hi)/2): (lo & hi) + ((lo ^ hi) >> 1) never
      // forms lo+hi or hi-lo, so it is exact even when [lo, hi] spans more
      // than Long.MaxValue (e.g. a fingerprint64 column with values near
      // both Long extremes, where hi - lo overflows signed long).
      val mid = (lo & hi) + ((lo ^ hi) >> 1)
      val cnt = d.where(col("v") <= lit(mid)).count()
      if (cnt >= k) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Exact lower median: kth at k = ⌈n/2⌉. */
  def exactMedian(df: DataFrame, value: Column): Long = {
    val n = df.select(value.cast("long").as("v")).where(col("v").isNotNull).count()
    require(n >= 1, "exactMedian of an empty column")
    exactKth(df, value, (n + 1) / 2)
  }
}
