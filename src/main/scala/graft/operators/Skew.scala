package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hot keys (north rule: "partitioning / shuffle
  * / skew handled explicitly"; SURVEY.md §4 item 1).
  *
  * Where it matters: on a web corpus a handful of canonical entities
  * ("united_states", "google") dominate mentions and description merges.
  * Plain partial aggregation already combines map-side, but any
  * SET-valued or list-valued aggregate still funnels every partial of a hot
  * key into ONE reduce task. The standard fix is two-phase aggregation over
  * a salt derived from a high-cardinality sibling column: phase 1 reduces
  * (key, salt) — spreading the hot key over `nSalts` tasks — phase 2 merges
  * the ≤ nSalts partials per key, which is bounded work regardless of how
  * hot the key is.
  *
  * AQE's skew-join splitting (enabled in every session builder here) covers
  * the JOIN side of the same problem at runtime; these helpers cover the
  * aggregation side, which AQE does not re-plan.
  */
object Skew {

  /** Salt column derived from a sibling column's hash — deterministic. */
  def saltCol(from: Column, nSalts: Int): Column =
    pmod(xxhash64(from), lit(nSalts)).cast("int")

  /** Two-phase collect_set: salt-local distinct sets, then a bounded final
    * merge. Result column is a sorted array for determinism.
    */
  def saltedCollectSet(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltFrom: String, nSalts: Int = 64, out: String = "values"): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", saltCol(col(saltFrom), nSalts))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sort_array(array_distinct(flatten(collect_list(col("__partial"))))).as(out))
  }

  /** Two-phase count per key (hot-key-proof frequency table). */
  def saltedCount(df: DataFrame, keyCols: Seq[String], saltFrom: String,
      nSalts: Int = 64, out: String = "cnt"): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", saltCol(col(saltFrom), nSalts))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).cast("long").as(out))
  }

  /** Two-phase distinct on the key tuple: salt-local dropDuplicates spreads
    * a hot duplicate flood before the global pass sees it.
    */
  def saltedDistinct(df: DataFrame, keyCols: Seq[String], saltFrom: String,
      nSalts: Int = 64): DataFrame =
    df.withColumn("__salt", saltCol(col(saltFrom), nSalts))
      .dropDuplicates(keyCols :+ "__salt")
      .drop("__salt")
      .dropDuplicates(keyCols)
}
