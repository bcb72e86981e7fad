package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) is the
  * first line of defense and needs no code. This manual salted join is
  * the fallback for the cases AQE cannot fix — e.g. a single hot key
  * whose rows exceed one executor's memory in a shuffled hash join, or
  * a skewed aggregation feeding a join.
  *
  * Shape: the build side is replicated `salt` times (one copy per salt
  * bucket), the probe side scatters uniformly across buckets, and the
  * join key becomes (key, salt). A hot probe key now lands on `salt`
  * different reducers instead of one. Cost: build side shuffles `salt`×
  * its size — use only when probe skew dominates build size.
  */
object Skew {

  /** Inner equi-join `probe ⋈ build` on probe(`probeKey`) =
    * build(`buildKey`), with the probe side salted into `salt` buckets.
    * Result is row-identical to the plain join (salting only changes
    * physical placement).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String, salt: Int): DataFrame = {
    // any per-row scatter works — result is salt-invariant; a hash of
    // the whole row would do, the partition-local row id is cheaper
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          probe(probeKey) === build(buildKey))
      .drop("_salt")
  }

  /** Declared query: per-market-segment event rollup through the salted
    * join — events (the probe, where a hot user would concentrate a
    * reducer) joined to customers across `salt` buckets, then
    * aggregated. Row-identical to the plain join by construction, so
    * the oracle is the unsalted SQL join — the correctness contract a
    * skew mitigation must keep.
    */
  def skewJoinSalted(spark: SparkSession, sfDir: String,
                     salt: Int = 8): DataFrame = {
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(events, cust, "user_id", "c_custkey", salt)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("events"), Det.dsum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Two-phase (salted) aggregation for a skewed group key: partial
    * aggregate on (key, salt), then final on key. For algebraic
    * aggregates Spark's partial+final HashAggregate already does
    * exactly this; use for holistic aggregates (e.g. collect_list
    * capped-sample per key) where map-side combine cannot help.
    */
  def saltedAgg(df: DataFrame, key: Column, salt: Int,
                partial: Column => Column, merge: Column => Column,
                valueCol: Column): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(key.as("_k"), col("_salt"))
      .agg(partial(valueCol).as("_p"))
      .groupBy(col("_k"))
      .agg(merge(col("_p")).as("agg"))
}
