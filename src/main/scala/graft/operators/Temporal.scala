package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: backward/forward as-of
  * join and a bounded-interval range join. Both are built so the wide step
  * is a SINGLE equi-shuffle on the join key — the naive formulations
  * (theta join `r.ts <= l.ts`, or point-in-interval cross filter) plan as
  * BroadcastNestedLoop/Cartesian and die at scale.
  *
  * As-of: the union-and-carry-forward formulation. Tag both sides, union on
  * the key, sort each key's rows by (ts, side, tie) inside the one shuffle a
  * window needs, and carry the last right-side payload forward. Cost is one
  * shuffle + one sort — the same as any window aggregate — independent of
  * how many right rows precede each left row (a per-pair join would be
  * O(|L|·|R|) per key). This is the classic streaming formulation of ASOF
  * used by kdb/QuestDB/DuckDB's sorted-merge path, expressed as a Catalyst
  * window so AQE/codegen apply.
  *
  * Range join: grid bucketing. Each interval explodes to the grid cells it
  * covers (bounded by `maxCellsPerInterval`, enforced in-plan via
  * `raise_error` — no driver action); each point maps to exactly ONE cell,
  * so the equi-join on (key, cell) + residual `between` filter yields every
  * qualifying pair exactly once with no post-dedup. Shuffle volume is
  * O(points + intervals·cells), never O(points·intervals).
  */
object Temporal {

  /** As-of join: for each `left` row, attach the payload of the `right` row
    * with the greatest `rightTs <= leftTs` (direction "backward", default)
    * or the least `rightTs >= leftTs` ("forward"), per join key. Equal
    * timestamps match. Ties among right rows sharing the winning timestamp
    * break deterministically toward the greatest `tieBreak` value.
    *
    * Output: every `left` column unchanged, plus each `rightPayload` column
    * as `<prefix><name>` (null when no right row qualifies — left-outer
    * semantics).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      prefix: String = "asof_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    val payloadType =
      right.select(struct(rightPayload.map(col): _*).as("__r")).schema.head.dataType
    val leftStructType =
      left.select(struct(leftCols.map(col): _*).as("__l")).schema.head.dataType

    val l = left.select(
      keys.map(col) :+
        col(leftTs).as("__ts") :+
        lit(1).as("__side") :+                       // left sorts AFTER right at equal ts
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(payloadType).as("__r"): _*)
    // NULL-timestamp right rows can never satisfy `rightTs <= leftTs` (or
    // >=) under ASOF/SQL semantics, but under the window ordering they would
    // sort first (Spark asc = nulls first) and their payload would be
    // carried onto left rows that have no genuine match — drop them here.
    val r = right.where(col(rightTs).isNotNull).select(
      keys.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        col(tieBreak).as("__tie") :+
        lit(null).cast(leftStructType).as("__l") :+
        struct(rightPayload.map(col): _*).as("__r"): _*)

    // Ordering: ts in scan direction; right (side 0) before left at equal ts
    // so an equal-timestamp right row is visible to the left row; among
    // right rows at the winning ts, ascending tie ⇒ the LAST carried row has
    // the max tie — deterministic under any partitioning. NULL left
    // timestamps (the only NULL __ts left after the right-side filter) are
    // pinned FIRST in scan order so they precede every right row and carry
    // null — a NULL-ts left row matches nothing, it doesn't match everything.
    val ord: Seq[Column] =
      if (direction == "backward")
        Seq(col("__ts").asc_nulls_first, col("__side").asc, col("__tie").asc)
      else
        Seq(col("__ts").desc_nulls_first, col("__side").asc, col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__carry", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightPayload.map(c => col(s"__carry.$c").as(s"$prefix$c")): _*)
  }

  /** Range join: inner-join `points` rows to every `intervals` row of the
    * same key whose `[startCol, endCol]` (inclusive both ends) contains
    * `pointTs`. `gridSeconds` is the bucketing granularity — choose it near
    * the typical interval length; an interval spanning more than
    * `maxCellsPerInterval` grid cells fails the job in-plan (that is the
    * signal the grid is mis-sized for the data, not a case to silently
    * explode). Non-key column names must be disjoint across the two inputs.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      startCol: String,
      endCol: String,
      gridSeconds: Long,
      maxCellsPerInterval: Int = 1024): DataFrame = {
    require(gridSeconds > 0, "rangeJoin: gridSeconds must be positive")
    val gridMicros = gridSeconds * 1000000L
    // cast covers TIMESTAMP_NTZ parquet columns; NTZ→TZ is monotone and both
    // sides map through the same function, so cell alignment is unaffected
    def cellOf(ts: Column): Column = floor(unix_micros(ts.cast("timestamp")) / gridMicros)

    val nCells = cellOf(col(endCol)) - cellOf(col(startCol)) + 1
    // Inverted intervals (end < start ⇒ nCells <= 0) would pass a bare
    // `nCells <= max` budget guard and make `sequence` emit a DESCENDING
    // junk cell list; they contain no point under `between`, so they explode
    // to zero cells instead. Only genuinely over-wide intervals raise.
    val iv = intervals
      .withColumn("__cell", explode(
        when(nCells >= 1, sequence(
          cellOf(col(startCol)),
          when(nCells <= maxCellsPerInterval, cellOf(col(endCol)))
            .otherwise(raise_error(concat(
              lit(s"rangeJoin: interval spans more than $maxCellsPerInterval cells at grid=${gridSeconds}s: "),
              col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"))))))
          .otherwise(array().cast("array<bigint>"))))
    val pt = points.withColumn("__cell", cellOf(col(pointTs)))

    pt.join(iv, keys :+ "__cell")
      .where(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__cell")
  }
}
