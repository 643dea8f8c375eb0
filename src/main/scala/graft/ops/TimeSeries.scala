package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8bis batch time-series utilities over the event log.
  *
  * Gap-filling is the standard prerequisite for monitoring dashboards,
  * feature windows and forecasting inputs: a bucket-aggregated series
  * has NO row for an empty bucket, and every downstream moving
  * average / diff silently skips the hole unless a spine restores it.
  */
object TimeSeries {

  /** Gap-filled 15-minute resample of purchase events. Pipeline:
    * epoch-arithmetic bucketing (engine-neutral, unlike locale/tz-bound
    * truncation helpers) → bucket agg → min/max bounds → `sequence()`
    * time spine → left join → zero-fill counts + forward-fill the last
    * observed bucket sum (`last_value IGNORE NULLS`).
    *
    * Scale: the agg shuffles on the bucket key like any grouped agg;
    * the spine's size is bounded by the TIME RANGE (2 880 buckets per
    * month at 15 min), not by event volume, so the single-partition
    * ordered window over it is a deliberate, bounded exception to the
    * no-global-window rule — at 100 TB you would partition the spine
    * and the window by series key (one spine per metric), which this
    * plan extends to by adding the key to both groupBys. */
  def timeseriesGapfill(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .select(expr("timestamp_seconds((unix_timestamp(ts) div 900) * 900)")
        .as("bucket_ts"), col("value"))
    val agg = buckets.groupBy(col("bucket_ts"))
      .agg(count(lit(1)).as("n_events"),
        Det.sum2(col("value")).as("sum_value"))
    val bounds = agg.agg(min(col("bucket_ts")).as("b0"),
      max(col("bucket_ts")).as("b1"))
    val spine = bounds.select(explode(
      sequence(col("b0"), col("b1"), expr("interval 15 minutes")))
      .as("bucket_ts"))
    val w = Window.orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, Seq("bucket_ts"), "left")
      .select(col("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(w)
          .as("ffill_value"))
      .orderBy(col("bucket_ts"))
  }
}
