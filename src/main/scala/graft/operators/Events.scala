package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators for the training-data pipeline scope:
  * sessionization (gaps-and-islands — two window functions, no UDF, fully
  * codegen'd) and funnel-style per-session aggregation. At scale both
  * shuffle once on the user key; AQE skew-split covers bot-like hot users.
  */
object Events {

  /** Split each user's events into sessions at `gapSeconds` inactivity:
    * classic lag + cumulative-sum-of-boundaries. Deterministic ordering by
    * (ts, event_id). Output one row per session.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        // exact order-free sum without decimal aggregation: `value` is
        // fixed-scale 2dp, so round(x*100)::long is the exact scaled integer
        // and a plain LONG sum stays a codegen'd HashAggregate (decimal(18,6)
        // sums widen past precision 18 → BigDecimal accumulation, the r2
        // q_agg_pricing 4x regression)
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
  }
}
