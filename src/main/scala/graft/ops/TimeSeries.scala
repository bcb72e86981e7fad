package graft.ops

import graft.{Tables, Det}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Volume-anomaly detection over the event log: flag (series, day)
    * cells whose daily count deviates from the series mean by more than
    * `k` population standard deviations — the monitoring query a
    * lakehouse runs over every ingest feed (traffic spikes, dead
    * sources).
    *
    * EXACT across engines by construction: the test
    * `|c − μ| > k·σ`  ⇔  `(n·c − S)² > k²·(n·SS − S²)`
    * is evaluated in DECIMAL(38,0) integer arithmetic (counts are
    * integers, so S=Σc and SS=Σc² are too) — no float mean/stddev whose
    * accumulation order could differ between Spark and the oracle.
    * Headroom: n·c ≲ 4·10¹² even at 10⁹ events/day over a decade, and
    * its square ≲ 1.6·10²⁵ ≪ 10³⁸.
    *
    * Plan shape: the raw log collapses to (series, day) counts in one
    * partial+final agg; the per-series moments ride as unbounded window
    * aggregates over that tiny table (one shuffle on the series key; no
    * second scan, no cache to own). Nothing downstream of the first
    * aggregate scales with input size.
    */
  def anomalyDays(events: DataFrame, k: Int = 2): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("events"))
    val ev = col("events").cast(dec)
    // per-series moments as unbounded window aggregates over the daily
    // table: ONE pass, one shuffle on the series key, no second
    // aggregation branch (which would rescan the log or need a cache a
    // library callee has no way to unpersist). Window state is bounded
    // by days-per-series. The c² term casts each FACTOR to decimal
    // first — a long×long square wraps past ~3·10⁹ events/day.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    daily
      .withColumn("n", count(lit(1)).over(w).cast(dec))
      .withColumn("s", sum(ev).over(w))
      .withColumn("ss", sum((ev * ev).cast(dec)).over(w))
      .select(col("event_type"), col("day"), col("events"),
        (pow2(col("n") * ev - col("s")) >
          lit(k * k) * (col("n") * col("ss") - pow2(col("s"))))
          .as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  private def pow2(c: Column): Column = (c * c).cast(DecimalType(38, 0))

  def anomalyQuery(spark: SparkSession, sfDir: String): DataFrame =
    anomalyDays(Tables.events(spark, sfDir))

  /** Rolling `window`-day distinct users per day (the WAU / rolling-MAU
    * family) — the aggregation plain GROUP BY cannot express because
    * distinct counts don't add across days.
    *
    * Plan shape: the log collapses to distinct (user, day) cells in one
    * partial+final agg — everything after runs on that cell table. Each
    * cell then activates the `window` days it is visible to (a bounded
    * ×window explode of the CELL table, not the log), and the final
    * count-distinct shuffles (day, user) pairs once. Days beyond the
    * last observed day are clamped via a broadcast 1-row bounds
    * aggregate. A day with no active user in its trailing window is
    * absent (reads as zero). At sketch-tolerant accuracy the same
    * rollup unions the last `window` daily HLL sketches instead
    * ([[graft.ops.Sketches]]) — no explode at all.
    */
  def rollingDistinctUsers(events: DataFrame, window: Int = 7): DataFrame = {
    val ud = events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    // bounds from the RAW log, not from `ud`: ud is users×days (too big
    // to cache at scale), and deriving the max through it would pay its
    // distinct shuffle twice. A max over the pruned 1-column scan is a
    // partial+final agg with no shuffle of consequence.
    val bounds = events.agg(max(date_trunc("day", col("ts"))).as("mx"))
    ud.select(col("user_id"),
        explode(sequence(col("day"),
          col("day") + expr(s"interval ${window - 1} days"),
          expr("interval 1 day"))).as("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("mx"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as(s"users_${window}d"))
      .orderBy(col("day"))
  }

  def rollingUsersQuery(spark: SparkSession, sfDir: String): DataFrame =
    rollingDistinctUsers(Tables.events(spark, sfDir))
}
