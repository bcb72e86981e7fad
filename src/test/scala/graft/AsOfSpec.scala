package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("as-of join equals the brute-force correlated definition") {
    val got = AsOf.eventOrders(spark, sfTiny).cache()
    val events = Tables.events(spark, sfTiny)
    assert(got.count() === events.count())

    // brute force: left join on key + orderdate<=ts, keep the latest
    // order (ties on date broken by largest o_orderkey, matching the
    // union+window's running-last over (t, tag, tie) ascending)
    val ord = Tables.orders(spark, sfTiny)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val brute = events.select(col("event_id"), col("user_id"), col("ts"))
      .join(ord, col("o_custkey") === col("user_id") && col("o_orderdate") <= col("ts"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_id")
          .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey").as("b_orderkey"),
        col("o_totalprice").as("b_totalprice"))

    val diff = got.join(brute, "event_id")
      .filter(
        (col("asof_orderkey").isNull =!= col("b_orderkey").isNull) ||
        (col("asof_orderkey").isNotNull &&
          (col("asof_orderkey") =!= col("b_orderkey") ||
           col("asof_totalprice") =!= col("b_totalprice"))))
      .count()
    assert(diff === 0)
    // non-degenerate: matches exist
    assert(got.filter(col("asof_orderkey").isNotNull).count() > 0)
    got.unpersist()
  }
}
