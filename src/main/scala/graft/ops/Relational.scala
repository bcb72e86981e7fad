package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core: scan / project / cast / datetime-derive / filter —
  * the reference's bronze+silver surface (reference
  * `src/etl_pipeline.py:43-91`, `src/utils.py:14-49`) transposed onto the
  * fixture schema per `FIXTURES.md`.
  *
  * Each stage is a composable `DataFrame => DataFrame` so the medallion
  * pipeline (`graft.pipeline.Medallion`) and the declared queries share
  * one definition. All expressions are built-in Catalyst functions —
  * whole-stage-codegen'd, pushdown-friendly, no UDFs.
  */
object Relational {

  /** Bronze ingest (reference `src/etl_pipeline.py:49-64`): parse the event
    * timestamp and derive partition/grouping fields year/month/day/hour.
    * At scale the derived year/month become the physical partition keys
    * (see Medallion); the scan itself projects only what's needed.
    */
  val bronzeDerive: DataFrame => DataFrame = df =>
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))

  def bronzeIngest(spark: SparkSession, sfDir: String): DataFrame =
    bronzeDerive(Tables.events(spark, sfDir))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("year"), col("month"), col("day"), col("hour"))
      .orderBy(col("event_id"))

  /** Silver cleaning stage (reference `src/utils.py:14-49`):
    * explicit casts, a conjunctive positive-value filter, an
    * inter-column theta predicate, an open-interval range filter, and
    * derived measure columns. On lineitem:
    *   - casts: l_linenumber → int, quantity/prices → double (the
    *     reference's FloatType casts, widened per SURVEY §1)
    *   - conjunctive: quantity > 0, extendedprice > 0, 0 ≤ discount ≤ 1,
    *     tax ≥ 0  (analog of fare/distance/passenger > 0)
    *   - theta: l_quantity < l_extendedprice (analog of pickup < dropoff)
    *   - range: 0 < l_quantity < 50 open interval (analog of duration
    *     bounds)
    *   - derived: revenue = extendedprice*(1-discount),
    *     charge = revenue*(1+tax)  (analog of trip_duration_minutes)
    * Derived doubles stay raw (bit-identical per-row IEEE arithmetic —
    * see graft.Det).
    */
  val silverCast: DataFrame => DataFrame = df =>
    df.withColumn("l_linenumber", col("l_linenumber").cast(IntegerType))
      .withColumn("l_quantity", col("l_quantity").cast(DoubleType))
      .withColumn("l_extendedprice", col("l_extendedprice").cast(DoubleType))
      .withColumn("l_discount", col("l_discount").cast(DoubleType))
      .withColumn("l_tax", col("l_tax").cast(DoubleType))

  val silverFilter: DataFrame => DataFrame = df =>
    df.filter(
        col("l_quantity") > 0 &&
        col("l_extendedprice") > 0 &&
        col("l_discount") >= 0 && col("l_discount") <= 1 &&
        col("l_tax") >= 0)
      .filter(col("l_quantity") < col("l_extendedprice"))
      .filter(col("l_quantity") > 0 && col("l_quantity") < 50)

  val silverDerive: DataFrame => DataFrame = df =>
    df.withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn("charge", col("revenue") * (lit(1.0) + col("l_tax")))
      .withColumn("ship_year", year(col("l_shipdate")))
      .withColumn("ship_month", month(col("l_shipdate")))

  val silverStage: DataFrame => DataFrame =
    silverCast.andThen(silverFilter).andThen(silverDerive)

  def silverClean(spark: SparkSession, sfDir: String): DataFrame =
    silverStage(Tables.lineitem(spark, sfDir))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
}
