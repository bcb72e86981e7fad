package graft.ops

import graft.{Tables, Det}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the event log: resample to a fixed
  * daily grid, zero-fill gaps, and carry the last observed average
  * forward — the shape a lakehouse serves to dashboards and forecast
  * featurizers, which need every (series, day) cell present (SURVEY
  * §2b extension surface; the reference's gold tables
  * `/root/reference/src/etl_pipeline.py:104-142` leave gaps where no
  * rows exist).
  *
  * Scale design: the raw log collapses to (series, day) grain in ONE
  * partial+final aggregate — everything after runs on that aggregate,
  * whose cardinality is series × days regardless of input size. The
  * day grid is generated from a broadcast 1-row bounds aggregate
  * (`sequence` + explode over series × [min, max]) — never from the
  * raw log — and the gap-join probes the aggregate with the grid, both
  * tiny. The forward-fill window partitions by series and orders by
  * day: per-partition row count is bounded by calendar days, not data
  * volume.
  */
object TimeSeries {

  /** Daily per-type event counts/revenue on a dense, zero-filled day
    * grid with a carried-forward daily average. `filled` marks
    * gap-synthesized rows.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("events"),
        Det.dsum(col("value")).as("day_value"),
        Det.davg(col("value")).as("avg_value"))
      .cache() // series×days rows; feeds bounds, grid keys, and the probe

    val bounds = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 day")))
          .as("day"))

    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("events"), lit(0L)).as("events"),
        coalesce(col("day_value"), lit(0.0)).as("day_value"),
        col("events").isNull.as("filled"),
        col("avg_value"))
      .withColumn("carry_avg",
        last(col("avg_value"), ignoreNulls = true).over(
          Window.partitionBy(col("event_type")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("avg_value")
      .orderBy(col("event_type"), col("day"))
  }

  def gapFillQuery(spark: SparkSession, sfDir: String): DataFrame =
    gapFillDaily(Tables.events(spark, sfDir))
}
