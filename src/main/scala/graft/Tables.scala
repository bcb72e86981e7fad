package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders over the driver-generated parquet fixtures
  * (`TESTDATA.md`). One parquet file per table under `sfDir`.
  *
  * Design notes for scale: every loader returns a plain scan DataFrame so
  * Catalyst can push filters/projections into the parquet reader. Nothing
  * here collects or caches; callers decide materialization.
  */
object Tables {

  /** Plain parquet scan. Filters/pruning push down via Catalyst. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects. We read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
    * TIMESTAMP_NTZ — the same naive-wallclock semantics DuckDB gives the
    * column. Sub-microsecond precision is truncated (grouping/sorting in the
    * declared queries is at hour/day granularity, so this is lossless for
    * query semantics).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, sfDir, "events")
      // integer `div`, not `/`: nanos (~1.7e18) exceed double's exact
      // integer range, so float division then cast flips the last µs
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
  }

  def region(spark: SparkSession, d: String): DataFrame   = t(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame   = t(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = t(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = t(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame     = t(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame   = t(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = t(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame  = t(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = t(spark, d, "embeddings")

  /** Spread a scan across all cores before a CPU-heavy narrow pipeline
    * (shingling, hashing, per-row scoring). The local fixtures are single
    * small parquet files → a single input split → one task doing all the
    * work; the round-robin shuffle here is tiny (input bytes) and buys
    * full parallelism for the expensive downstream expressions. At
    * cluster scale inputs arrive already split, but the same guard
    * applies whenever file count < cores (e.g. few huge row groups).
    */
  def parallelize(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}

/** Helpers for DuckDB-oracle-deterministic aggregation.
  *
  * Floating sums/averages differ between engines by accumulation order.
  * Strategy: route every aggregated double through an exact
  * `DECIMAL(30,6)` intermediate — rounding a double to 6 fractional
  * digits is order-independent and identical in Spark and DuckDB for the
  * value ranges in the fixtures, and decimal summation is exact — then
  * cast the final result back to DOUBLE (equal decimals convert to
  * bit-identical doubles on both engines).
  *
  * Per-row (non-aggregated) double arithmetic needs none of this: the same
  * IEEE-754 ops over the same inputs are bit-identical across engines.
  */
object Det {
  val Dec: DecimalType = DecimalType(30, 6)

  /** Order-independent exact sum of a double column, returned as double.
    * Oracle SQL equivalent: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent avg, returned as double.
    * Oracle SQL: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column): Column = dsum(c) / count(c)
}
