package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column facades over Spark's native Bloom-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-level filtering, available as expressions but not
  * registered as public SQL functions). Using them instead of a Scala
  * `udf` + manual `sparkContext.broadcast` keeps the probe inside
  * whole-stage codegen and lets the filter ride the plan as a scalar
  * subquery: one aggregation builds the filter, Spark broadcasts the
  * subquery result, and every probe row pays a codegen'd bit-test with
  * no boxing boundary.
  *
  * `might_contain` requires its Bloom side to be foldable or a scalar
  * subquery, so [[bloomOf]] returns `df.agg(...).scalar()` — the
  * Spark 4 scalar-subquery Column — rather than a joined attribute.
  */
object BloomNative {

  /** Idempotent per-session registration of the expression pair. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Standard optimal bit count: m = ⌈−n·ln p / ln²2⌉. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Scalar-subquery Column holding the Bloom filter (binary) built
    * over xxhash64 of `keyCol` across all rows of `df`. Null keys hash
    * to the xxhash64 seed — harmless: probes of genuinely-null keys
    * must be resolved by an exact confirm step anyway.
    *
    * Spark SILENTLY caps `BloomFilterAggregate` at the session limits
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * (defaults 4M items / 67.1M bits — sized for runtime join filters,
    * not corpus dedup). A capped filter saturates and quietly stops
    * pruning, so the limits are raised here to the requested sizing.
    */
  def bloomOf(df: DataFrame, keyCol: Column,
              expectedItems: Long, fpp: Double): Column = {
    val spark = df.sparkSession
    register(spark)
    val numBits = optimalNumBits(expectedItems, fpp)
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    if (spark.conf.get(itemsKey).toLong < expectedItems)
      spark.conf.set(itemsKey, expectedItems.toString)
    if (spark.conf.get(bitsKey).toLong < numBits)
      spark.conf.set(bitsKey, numBits.toString)
    df.agg(call_function("graft_bloom_agg", xxhash64(keyCol),
      lit(expectedItems), lit(numBits)).as("bf"))
      .scalar()
  }

  /** Codegen'd probe: might the filter contain `keyCol`? False (not
    * null) when the filter itself is null — i.e. built over zero rows —
    * so an empty build side means "definitely new" rather than dropping
    * every probe row.
    */
  def mightContain(spark: SparkSession, bloom: Column, keyCol: Column): Column = {
    register(spark)
    coalesce(call_function("graft_might_contain", bloom, xxhash64(keyCol)),
      lit(false))
  }
}
