package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with the same key and timestamp ≤ the left timestamp. Spark has no
  * built-in for this (DuckDB: `ASOF JOIN`; Pandas: `merge_asof`).
  *
  * Implementation is the scale-correct union+window formulation, not a
  * range join:
  *
  *   1. union both sides into one stream tagged (0 = right/event,
  *      1 = left/probe), one row schema;
  *   2. one hash shuffle on the key, per-key sort by (time, tag, id);
  *   3. running `last(…, ignoreNulls)` carries the most recent right-side
  *      attributes forward; left rows then read their as-of match from
  *      the carried columns.
  *
  * Cost: ONE shuffle of |L|+|R| constant-width rows and a per-key sort —
  * versus a range join's per-key quadratic blowup or an interval
  * broadcast. Skewed keys degrade to a per-key sort, not a cross
  * product. Ties at equal time resolve right-before-left (inclusive ≤),
  * then by id — fully deterministic, and expressible verbatim in the
  * DuckDB oracle.
  */
object AsOf {

  /** Generic as-of join: every `left` row gains `prefix`-named copies of
    * `rightValueCols` from the latest `right` row with the same key and
    * `rightTime` ≤ `leftTime` (left-outer: no prior right row → NULLs).
    *
    * `rightTie` breaks ties among equal-time right rows (largest wins,
    * matching "latest"); `leftTie` makes the output deterministic when a
    * left row and right row share a timestamp (right-before-left,
    * inclusive ≤). One shuffle on the key; see class doc.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               leftTie: String, rightTie: String,
               rightValueCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val carried = rightValueCols
    val l = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +:
        lit(1).as("_tag") +: col(leftTie).cast(LongType).as("_tie") +:
        leftCols.map(col)) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +:
        lit(0).as("_tag") +: col(rightTie).cast(LongType).as("_tie") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        carried.map(c => col(c).as(s"_r_$c")): _*)
    val run = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCarry = carried.foldLeft(r.unionAll(l)) { (df, c) =>
      df.withColumn(s"$prefix$c", last(col(s"_r_$c"), ignoreNulls = true).over(run))
    }
    withCarry
      .filter(col("_tag") === 1)
      .select((leftCols.map(col) ++ carried.map(c => col(s"$prefix$c"))): _*)
  }

  /** Declared query: each event joined as-of to the user's most recent
    * order at or before the event time (events.user_id and o_custkey
    * share the 0..149 id space in the fixtures; users without a prior
    * order keep NULL order columns — left-outer semantics).
    */
  def eventOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("key"), col("o_orderdate").as("t"),
      lit(0).as("tag"), col("o_orderkey").as("tie"),
      col("o_orderkey").as("r_orderkey"),
      col("o_orderdate").as("r_orderdate"),
      col("o_totalprice").as("r_totalprice"),
      lit(null).cast(LongType).as("event_id"),
      lit(null).cast(StringType).as("event_type"))
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("key"), col("ts").as("t"),
      lit(1).as("tag"), col("event_id").as("tie"),
      lit(null).cast(LongType).as("r_orderkey"),
      lit(null).cast(TimestampNTZType).as("r_orderdate"),
      lit(null).cast(DoubleType).as("r_totalprice"),
      col("event_id"), col("event_type"))
    val run = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("tag"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionAll(ev)
      .withColumn("asof_orderkey", last(col("r_orderkey"), ignoreNulls = true).over(run))
      .withColumn("asof_orderdate", last(col("r_orderdate"), ignoreNulls = true).over(run))
      .withColumn("asof_totalprice", last(col("r_totalprice"), ignoreNulls = true).over(run))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("t").as("ts"),
        col("asof_orderkey"), col("asof_orderdate"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }
}
