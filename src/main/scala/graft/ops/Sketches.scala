package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches for the gold layer — the
  * pre-aggregation pattern exact COUNT(DISTINCT) forbids: distinct
  * counts don't add, so a lakehouse that wants "distinct users per day,
  * week, month, all-time" from one pass must either rescan the fact
  * table per granularity or store a MERGEABLE sketch per fine-grained
  * cell and union upward. Spark 4 ships Apache DataSketches HLL as
  * native aggregates (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate` — codegen'd, binary-typed state), so the
  * sketch table is an ordinary DataFrame.
  *
  * Scale shape: the fact table is touched ONCE, shuffling only
  * (series, day) cells each carrying a ≤ 2^lgK-register sketch; every
  * coarser rollup aggregates the sketch table (cells × KB), never the
  * log. Estimates carry ~1.04/√2^lgK relative error (~1.6% at lgK=12);
  * the spec gates the error against exact counts and asserts
  * merge-consistency (union of daily sketches ≡ sketch built directly
  * on the month — same registers, same estimate).
  */
object Sketches {

  /** Fine-grained sketch table: per (event_type, day) HLL sketch of
    * user_id, plus exact row counts (counts DO add — they ride along
    * for free).
    */
  /** One lgK for every sketch in the rollup family: `hll_union_agg`
    * with allowDifferentLgConfigK=false rejects mixed precisions, so
    * the daily sketches and the direct monthly twin must always agree
    * on this value.
    */
  val DefaultLgK: Int = 12

  def dailyUserSketches(events: DataFrame, lgK: Int = DefaultLgK): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        hll_sketch_agg(col("user_id"), lit(lgK)).as("user_sketch"),
        count(lit(1)).as("events"))

  /** Monthly rollup FROM THE SKETCH TABLE, SELF-VERIFYING (round 6 —
    * same banded-oracle design as `Aggregates.approxStats`): the union
    * estimate is checked in-query against (a) the exact distinct count
    * and (b) the direct monthly sketch, and the VERDICTS are the
    * output — exact anchor + two booleans the DuckDB oracle expects
    * literal TRUE. HLL registers themselves stay engine-native (not
    * SQL-expressible), but the properties that make the sketch table
    * correct — estimate within the documented band, daily-union ≡
    * direct-sketch merge losslessness — are now driver-checked, not
    * just spec-checked. The exact/direct twins rescan the log for the
    * gate; a 100 TB user keeps the union-estimate column only (one
    * pass over the sketch table, never the log — the operator's point).
    */
  def monthlyDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val viaDaily = dailyUserSketches(ev)
      .groupBy(col("event_type"), date_trunc("month", col("day")).as("month"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("user_sketch"), lit(false)))
          .as("est_union"),
        sum(col("events")).as("events"))
    val direct = ev
      .groupBy(col("event_type"), date_trunc("month", col("ts")).as("month"))
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(DefaultLgK)))
          .as("est_direct"),
        countDistinct(col("user_id")).as("distinct_users"))
    viaDaily.join(direct, Seq("event_type", "month"))
      .select(col("event_type"), col("month"), col("events"),
        col("distinct_users"),
        (abs(col("est_union") - col("distinct_users")) <=
          greatest(col("distinct_users").cast("double") * 0.05, lit(2.0)))
          .as("users_within_5pct"),
        (col("est_union") === col("est_direct")).as("merge_consistent"))
      .orderBy(col("event_type"), col("month"))
  }

  /** Sketch twin of [[graft.ops.TimeSeries.rollingDistinctUsers]]: the
    * rolling 7-day distinct-user count as a RANGE-framed union of daily
    * sketches — no ×window explode of the (user, day) cells at all; the
    * window slides over the tiny daily-sketch table (rows = days). The
    * range frame is keyed on epoch-day, so calendar gaps between
    * observed days are handled exactly (a row-frame would slide over
    * ROWS and silently widen across gaps). Only observed days are
    * emitted, estimates carry HLL error — the trade vs the exact
    * explode, spec-gated within 5%.
    */
  def rollingDistinctUsersSketch(events: DataFrame, window: Int = 7,
                                 lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"))
      .withColumn("day_num", datediff(col("day"), to_date(lit("1970-01-01"))))
    val w = Window.orderBy(col("day_num")).rangeBetween(-(window - 1), 0)
    daily
      .withColumn(s"users_${window}d_est",
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)).over(w)))
      .select(col("day"), col(s"users_${window}d_est"))
      .orderBy(col("day"))
  }

  /** Mergeable QUANTILE state — the percentile slot of the sketch
    * family (where t-digest/KLL would sit), built instead as a
    * fixed-width histogram so it is exact by construction and therefore
    * oracle-checkable: bin = floor(value / width), integer state
    * (day, bin, n). Counts add, so any coarser granularity merges by
    * summing — the fact table is scanned once, every rollup reads the
    * tiny histogram table. A quantile reads off the merged CDF as the
    * lower edge of the first bin whose cumulative count reaches
    * ceil(p·n): deterministic, no interpolation, error bounded by
    * `width` (the spec pins the exact identity
    * floor(exact_quantile/width)·width == reported value). At 100 TB
    * the trade vs t-digest is explicit: state is O(value_range/width)
    * per cell instead of O(compression), in exchange for exactness,
    * engine-portability, and bit-stable merges.
    */
  def dailyValueHistogram(orders: DataFrame, width: Double = 100.0): DataFrame =
    orders.groupBy(
        date_trunc("day", col("o_orderdate")).as("day"),
        floor(col("o_totalprice") / lit(width)).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Monthly p50/p90/p99 of order value FROM THE DAILY HISTOGRAM STATE
    * (the merge path — the log is never rescanned). The DuckDB oracle
    * recomputes the same quantiles DIRECTLY from the orders table, so a
    * hash match is a proof that daily→monthly merge loses nothing.
    */
  def monthlyValueQuantiles(spark: SparkSession, sfDir: String,
                            width: Double = 100.0,
                            ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    quantilesFromState(
      dailyValueHistogram(Tables.orders(spark, sfDir), width), width, ps)

  /** Monthly quantiles read off any (day, bin, n) histogram state —
    * shared by the declared query and the incremental-gold refresh path
    * ([[graft.pipeline.Incremental.histogramState]]), so "recompute from
    * facts" and "merge maintained state" provably present identically.
    */
  def quantilesFromState(state: DataFrame, width: Double = 100.0,
                         ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
    quantilesFromBinned(
      state.groupBy(date_trunc("month", col("day")).as("month"), col("bin"))
        .agg(sum(col("n")).as("n")),
      "month", width, ps, countName = "n_orders")

  /** Quantile readoff over ANY (key, bin, n) binned distribution — the
    * CDF selection shared by the monthly gold rollup and the streaming
    * hourly twin ([[graft.streaming.EventsStream.hourlyQuantilesStream]]):
    * per key, the lower edge of the first bin whose cumulative count
    * reaches ceil(p·total), for each probe p.
    *
    * PINNED-PROBE ASSUMPTION: the rank is ceil(p·total) in DOUBLE
    * arithmetic while the DuckDB oracle evaluates the same expression
    * in exact DECIMAL. For the declared probes (0.5/0.9/0.95/0.99 —
    * exactly representable) the products round identically, so the
    * readoffs agree; a caller-supplied p sitting on a representation
    * boundary could pick a rank off by one vs an exact-decimal oracle.
    * New declared queries must keep their probes in this exact set (or
    * extend the oracle to double arithmetic).
    */
  def quantilesFromBinned(binned: DataFrame, keyName: String, width: Double,
                          ps: Seq[Double], countName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import binned.sparkSession.implicits._
    val w = Window.partitionBy(col(keyName)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = binned
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col(keyName))))
    cdf.join(broadcast(ps.toDF("p")))
      .filter(col("cum") >= ceil(col("p") * col("total")))
      .groupBy(col(keyName), col("p"))
      .agg(
        (min(col("bin")) * lit(width)).as("value_floor"),
        max(col("total")).as(countName))
      .orderBy(col(keyName), col("p"))
  }

  /** Log-binned quantile sketch rollup ([[graft.functions.DdSketch]]) —
    * the sketch-family slot for HEAVY-TAILED value domains, where the
    * exact fixed-width histogram above is the wrong trade (state
    * O(value_range/width) per cell; a file-size or token-count domain
    * explodes it). Log-spaced bins hold state O(log(range)/α) with a
    * GUARANTEED relative error ≤ α at every rank.
    *
    * Self-verifying banded shape (the `approx_stats` /
    * `sketch_distinct_rollup` design): exact anchors (month, p,
    * n_orders) are recomputed by the DuckDB oracle; the sketch verdicts
    * ride as booleans the oracle expects literal TRUE —
    *
    *  - `within_alpha`: the monthly quantile read off the MERGED daily
    *    sketch states is within relative α of the exact order statistic
    *    at the same rank ceil(p·n) (computed in-query from the raw
    *    values — the rescan the sketch table exists to avoid; a 100 TB
    *    user keeps the estimate column only);
    *  - `merge_consistent`: daily states merged up to month ≡ a sketch
    *    built directly on the month — bin counts ADD, so the merge is
    *    provably lossless and the two estimates are bit-equal (same
    *    property that makes the HLL rollup's verdict checkable; KLL's
    *    randomized compaction could not make this promise under
    *    Spark's shuffle-order merges).
    *
    * Scale shape: one pass over facts builds daily (day, sketch) rows;
    * every coarser rollup merges ≤ maxBins integer cells per day —
    * the log is never rescanned.
    */
  def quantileSketchRollup(spark: SparkSession, sfDir: String,
                           alpha: Double = 0.01,
                           ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    import graft.functions.DdSketch
    val orders = Tables.orders(spark, sfDir)
    val month = date_trunc("month", col("o_orderdate")).as("month")
    // daily sketch table → merged monthly state (counts add)
    val mergedState = orders
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(DdSketch.sketch(spark, col("o_totalprice"), alpha).as("sk"))
      .select(date_trunc("month", col("day")).as("month"),
        explode(col("sk")).as("cell"))
      .groupBy(col("month"), col("cell.bin").as("bin"))
      .agg(sum(col("cell.n")).as("n"))
    // direct monthly sketch — the merge-losslessness reference
    val directState = orders.groupBy(month)
      .agg(DdSketch.sketch(spark, col("o_totalprice"), alpha).as("sk"))
      .select(col("month"), explode(col("sk")).as("cell"))
      .select(col("month"), col("cell.bin").as("bin"), col("cell.n").as("n"))
    val estMerged = ddQuantilesFromBinned(mergedState, "month", alpha, ps, "n_orders")
    val estDirect = ddQuantilesFromBinned(directState, "month", alpha, ps, "n_d")
      .withColumnRenamed("est", "est_direct").drop("n_d")
    // exact order statistic at the same rank, from the raw values
    // (bin = the value itself, width 1 → value_floor IS the exact value)
    val exact = quantilesFromBinned(
      orders.groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        col("o_totalprice").as("bin")).agg(count(lit(1)).as("n")),
      "month", 1.0, ps, countName = "n_e")
      .withColumnRenamed("value_floor", "exact_value").drop("n_e")
    estMerged.join(estDirect, Seq("month", "p"))
      .join(exact, Seq("month", "p"))
      .select(col("month"), col("p"), col("n_orders"),
        // 1e-9 relative slack: the α bound is tight in real arithmetic;
        // float rounding of the boundary case must not flip the verdict
        (abs(col("est") - col("exact_value")) <=
          lit(alpha) * col("exact_value") * lit(1 + 1e-9)).as("within_alpha"),
        (col("est") === col("est_direct")).as("merge_consistent"))
      .orderBy(col("month"), col("p"))
  }

  /** Quantile readoff over log-binned sketch state (key, bin, n):
    * same CDF selection as [[quantilesFromBinned]], with the bin index
    * mapped back to its value estimate 2γᵇ/(γ+1) (Int.MinValue is the
    * ≤0 bin, estimating 0).
    */
  def ddQuantilesFromBinned(binned: DataFrame, keyName: String, alpha: Double,
                            ps: Seq[Double], countName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import binned.sparkSession.implicits._
    val gamma = graft.functions.DdSketch.gammaOf(alpha)
    val w = Window.partitionBy(col(keyName)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col(keyName))))
      .join(broadcast(ps.toDF("p")))
      .filter(col("cum") >= ceil(col("p") * col("total")))
      .groupBy(col(keyName), col("p"))
      .agg(min(col("bin")).as("sel_bin"), max(col("total")).as(countName))
      .withColumn("est",
        when(col("sel_bin") === Int.MinValue, lit(0.0))
          .otherwise(lit(2.0) * pow(lit(gamma), col("sel_bin")) / lit(gamma + 1)))
      .drop("sel_bin")
  }

  /** The exact twin (rescans the log — what the sketch table avoids);
    * the spec's error-gate reference.
    */
  def monthlyDistinctUsersExact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("month", col("ts")).as("month"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("events"))
      .orderBy(col("event_type"), col("month"))
}
