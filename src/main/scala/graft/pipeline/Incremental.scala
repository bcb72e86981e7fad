package graft.pipeline

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental gold maintenance: refresh an aggregate table from a
  * DELTA of new fact rows without rescanning history — the standard
  * lakehouse pattern once the fact table outgrows full recomputes
  * (at 100 TB the nightly delta is GBs; the history is not).
  *
  * The design constraint is EXACTNESS under merging: sum/count are the
  * mergeable state, and they are kept as DECIMAL(30,6)/long — decimal
  * addition is associative, so state(all) ≡ merge(state(h1), state(h2))
  * bit-for-bit, however ingestion is sliced (the spec asserts this).
  * Derived presentation columns (double revenue, averages) are computed
  * FROM the state at read time, never merged themselves — merging
  * rounded doubles would drift by accumulation order. State tables
  * commit through [[ManifestTable]], so a failed refresh leaves the
  * previous consistent state readable.
  */
object Incremental {

  /** Exact mergeable state of the daily-revenue gold table over
    * (o_custkey, o_orderdate, o_totalprice) fact rows.
    */
  def dailyState(orders: DataFrame): DataFrame =
    orders.groupBy(
        col("o_custkey"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(
        sum(col("o_totalprice").cast(Det.Dec)).as("rev_dec"),
        // two counts on purpose: order_count counts rows, the average's
        // denominator counts non-null prices — they differ under nulls
        count(lit(1)).as("cnt_rows"),
        count(col("o_totalprice")).as("cnt_vals"))

  /** Merge current state with a delta's state — one partial+final
    * aggregate over the (tiny) union of two aggregates; group keys
    * shuffle once, facts are never touched.
    */
  def mergeDailyState(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy(col("o_custkey"), col("day"))
      .agg(
        sum(col("rev_dec")).as("rev_dec"),
        sum(col("cnt_rows")).as("cnt_rows"),
        sum(col("cnt_vals")).as("cnt_vals"))

  /** Negated daily state — the RETRACTION delta a change feed's
    * `delete` rows contribute: decimal sums and counts negate exactly,
    * so merge(state, negate(state(deleted rows))) removes precisely
    * what those rows once added (bit-exact, same associativity
    * argument as the forward merge). Consumers drop groups whose
    * cnt_rows reaches 0 — a fully retracted group leaves no tombstone.
    */
  def negateDailyState(state: DataFrame): DataFrame =
    state.select(
      col("o_custkey"), col("day"),
      (-col("rev_dec")).as("rev_dec"),
      (-col("cnt_rows")).as("cnt_rows"),
      (-col("cnt_vals")).as("cnt_vals"))

  /** Presentation view of the state — the exact schema/values of
    * [[graft.ops.Aggregates.goldDailyRevenue]].
    */
  def presentDaily(state: DataFrame): DataFrame =
    state.select(
        col("o_custkey"), col("day"),
        col("rev_dec").cast(DoubleType).as("daily_revenue"),
        col("cnt_rows").as("order_count"),
        (col("rev_dec").cast(DoubleType) / col("cnt_vals")).as("avg_order_value"))
      .orderBy(col("o_custkey"), col("day"))

  /** Exact mergeable HISTOGRAM state — the quantile slot of the gold
    * layer ([[graft.ops.Sketches.dailyValueHistogram]]): (day, bin, n)
    * integer counts. Counts add, so like the decimal revenue state the
    * merge is associative and bit-exact under any slicing of ingestion;
    * percentile presentation
    * ([[graft.ops.Sketches.quantilesFromState]]) reads the merged state
    * — history is never rescanned to refresh a quantile dashboard.
    */
  def histogramState(orders: DataFrame, width: Double = 100.0): DataFrame =
    graft.ops.Sketches.dailyValueHistogram(orders, width)

  def mergeHistogramState(current: DataFrame, delta: DataFrame): DataFrame =
    current.unionByName(delta)
      .groupBy(col("day"), col("bin"))
      .agg(sum(col("n")).as("n"))

  /** Retraction delta for the histogram state (integer counts negate
    * exactly — same contract as [[negateDailyState]]; consumers drop
    * emptied (day, bin) cells).
    */
  def negateHistogramState(state: DataFrame): DataFrame =
    state.select(col("day"), col("bin"), (-col("n")).as("n"))

  /** Log-bin sketch state (day, bin, n) — the HEAVY-TAILED quantile
    * slot ([[graft.functions.DdSketch]]) in the same mergeable-state
    * family: cells are integer counts over γ-spaced bins, so they add,
    * negate, and merge exactly like the fixed-width histogram's while
    * holding O(log range / α) cells per day on an unbounded value
    * domain. Readoff via
    * [[graft.ops.Sketches.ddQuantilesFromBinned]] (key = day, or any
    * rollup of it — counts add upward too).
    */
  def ddSketchState(orders: DataFrame, alpha: Double = 0.01): DataFrame =
    orders
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(graft.functions.DdSketch
        .sketch(orders.sparkSession, col("o_totalprice"), alpha).as("sk"))
      .select(col("day"), explode(col("sk")).as("cell"))
      .select(col("day"), col("cell.bin").as("bin"), col("cell.n").as("n"))

  def mergeDdSketchState(current: DataFrame, delta: DataFrame): DataFrame =
    mergeHistogramState(current, delta)

  def negateDdSketchState(state: DataFrame): DataFrame =
    negateHistogramState(state)
}
