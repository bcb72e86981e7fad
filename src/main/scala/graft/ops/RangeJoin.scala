package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — the join shape Spark has no operator for: a
  * plain `points.join(intervals, p BETWEEN lo AND hi)` with no equi key
  * plans as a BroadcastNestedLoopJoin, O(|P|·|I|) comparisons with one
  * side fully broadcast — a non-starter once either side stops fitting
  * in memory.
  *
  * The Spark-first fix is to MAKE an equi key: quantize the value
  * domain into fixed-width buckets. An interval covers
  * `(hi-lo)/width + 1` consecutive buckets (explode); a point falls in
  * exactly ONE bucket — so every true (point, interval) match meets in
  * precisely the point's bucket: the bucket equi-join + exact
  * containment filter is complete AND duplicate-free by construction
  * (no distinct() repair pass). This is the standard bucketized
  * interval-join layout (cf. interval partitioning in Chawda et al.,
  * "Processing Interval Joins On Map-Reduce", EDBT 2014).
  *
  * Scale properties: shuffle is an equi-join on bucket id; interval
  * replication is bounded by `maxSpan/width + 1` copies; bucket width
  * trades replication (wide intervals → fewer copies) against join
  * selectivity (narrower buckets → fewer false candidates). Skew =
  * buckets dense in both sides — AQE skew-split applies since it is a
  * plain equi-join after the explode.
  */
object RangeJoin {

  /** Generic core over a long-valued domain. `points` carries
    * `pointCol`; `intervals` carries `loCol` <= `hiCol` (both
    * inclusive). Returns the matched rows (all columns of both inputs).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth))
    val iv = intervals
      .withColumn("_bucket",
        explode(sequence(floor(col(loCol) / bucketWidth),
          floor(col(hiCol) / bucketWidth))))
    p.join(iv, "_bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Per-point concurrent-interval counts by sweep-line instead of the
    * join: +1 at lo, −1 at hi+1, one groupBy and one ordered prefix
    * sum. When a range join's ONLY consumer is a per-point COUNT (or
    * any decomposable aggregate of interval attributes), materializing
    * Σ(span) joined rows just to aggregate them away is the wrong plan
    * — the sweep is O(|I|) rows regardless of span. Returns
    * (boundary, active): the count holds on [boundary, next boundary).
    * The running sum is a two-phase distributed prefix sum
    * ([[Prefix]]) — no single-partition window at any scale.
    */
  def sweepActiveCounts(intervals: DataFrame,
                        loCol: String, hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deltas = intervals
      .select(col(loCol).as("boundary"), lit(1L).as("d"))
      .unionAll(intervals.select((col(hiCol) + 1).as("boundary"), lit(-1L).as("d")))
      .groupBy(col("boundary")).agg(sum(col("d")).as("d"))
    val (base, _) = Prefix.withOffsets(deltas, Seq(col("boundary")), col("d"))
    val wp = Window.partitionBy(col("_pid")).orderBy(col("boundary"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("active", col("_offset") + sum(col("d")).over(wp))
      .select(col("boundary"), col("active"))
  }

  /** Declared query: per order-date, how many lineitems are inside their
    * first fulfilment week (ordered, not yet shipped, ≤6 days old) — a
    * pure range join of the distinct day domain against
    * [order-date, min(ship-date, order-date+6)] intervals. The 7-day cap
    * bounds the joined row count at 7·|lineitem| (uncapped TPC-H ship
    * lags average ~60 days — a 60·|lineitem| intermediate whose only
    * consumer is a COUNT is [[sweepActiveCounts]]'s job, not a join's);
    * 8-day buckets bound interval replication at ≤2 copies.
    */
  def inTransitDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val iv = Tables.lineitem(spark, sfDir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(
        date_trunc("day", col("o_orderdate")).as("lo_ts"),
        date_trunc("day", col("l_shipdate")).as("hi_ts"))
      .filter(col("lo_ts") <= col("hi_ts"))
      .withColumn("lo", unix_date(to_date(col("lo_ts"))).cast("long"))
      .withColumn("hi",
        least(unix_date(to_date(col("hi_ts"))).cast("long"), col("lo") + 6))
    val days = orders
      .select(date_trunc("day", col("o_orderdate")).as("day")).distinct()
      .withColumn("p", unix_date(to_date(col("day"))).cast("long"))
    pointInInterval(days, iv, "p", "lo", "hi", bucketWidth = 8L)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("in_transit"))
      .orderBy(col("day"))
  }
}
