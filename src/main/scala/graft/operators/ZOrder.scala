package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
  * layout (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY; Morton
  * 1966): interleave the bits of two normalized dimensions so that rows
  * close in BOTH dimensions land close in the one-dimensional sort order.
  * A table range-partitioned and sorted by the z-value gets parquet
  * row-group min/max pruning on BOTH columns from one layout — at 100 TB
  * this is the difference between scanning everything and scanning the few
  * files whose (domain, date) — or (length, quality) — rectangle intersects
  * the predicate. Min/max stats per file stay tight on both dimensions
  * because the curve is locality-preserving; a single-column sort gives
  * tight stats on one dimension only.
  *
  * Everything here is exact integer arithmetic (shifts, masks, integral
  * div), so z-values are bit-identical across engines and the q_zorder
  * oracle recomputes them fully in SQL.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure codegen
    * bitwise expression — zero shuffles. Result < 4^bits (bits ≤ 31 keeps
    * every shift inside a long).
    */
  def zValueCol(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValueCol: bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(
          shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(
          shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Affine grid cell of an integer column over [mn, mx], exact integral
    * arithmetic: ((c − mn) · (2^bits − 1)) div (mx − mn) — floor division
    * of non-negative longs, engine-reproducible with no float rounding
    * anywhere. Constant columns map to cell 0.
    */
  def normalized(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"normalized: bits must be in [1, 31]")
    if (mx > mn) {
      val scale = (1L << bits) - 1L
      // decimal(38,0) arithmetic end to end: (c − mn) ≤ 2^64 and the scale
      // multiply peaks at 2^64·2^31 ≈ 10^28.6 < 10^38, so the affine map is
      // EXACT even when clustering a 64-bit hash/fingerprint column — pure
      // long math silently overflows once (mx − mn) > 2^63/scale (and
      // mx − mn itself overflows when the column spans both long extremes).
      // IntegralDivide on decimals still returns a long cell id.
      val dec = "decimal(38,0)"
      val range = (BigInt(mx) - BigInt(mn)).toString
      call_function("div",
        (c.cast(dec) - lit(mn).cast(dec)) * lit(scale).cast(dec),
        lit(range).cast(dec))
    } else lit(0L)
  }

  /** (min, max) of an integer column — one partial-agg pass, O(1) collect. */
  def minMax(df: DataFrame, colName: String): (Long, Long) = {
    val r = df.agg(min(col(colName).cast("long")), max(col(colName).cast("long")))
      .collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** Cluster a table on the z-value of two integer columns: range-partition
    * then sort within partitions by z — after a parquet write each file
    * covers a contiguous z-range, i.e. a small rectangle in (a, b) space,
    * which is what makes min/max skipping effective on both columns. The
    * z column is kept so readers can range-prune explicitly too.
    */
  def cluster(df: DataFrame, aCol: String, bCol: String, bits: Int,
      partitions: Int): DataFrame = {
    val (amn, amx) = minMax(df, aCol)
    val (bmn, bmx) = minMax(df, bCol)
    val z = zValueCol(
      normalized(col(aCol), amn, amx, bits),
      normalized(col(bCol), bmn, bmx, bits), bits)
    df.withColumn("z", z)
      .repartitionByRange(partitions, col("z"))
      .sortWithinPartitions(col("z"))
  }
}
