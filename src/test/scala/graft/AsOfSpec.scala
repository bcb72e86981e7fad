package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("generic asofJoin reproduces the declared asof_event_order query") {
    val events = Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "ts")
    val orders = Tables.orders(spark, sfTiny)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val generic = AsOf.asofJoin(
      events, orders,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      leftTie = "event_id", rightTie = "o_orderkey",
      rightValueCols = Seq("o_orderkey", "o_totalprice"))
    val declared = AsOf.eventOrders(spark, sfTiny)
    val diff = generic
      .select(col("event_id"),
        col("asof_o_orderkey").as("g_key"), col("asof_o_totalprice").as("g_price"))
      .join(declared.select(col("event_id"), col("asof_orderkey"), col("asof_totalprice")),
        "event_id")
      .filter(
        (col("g_key").isNull =!= col("asof_orderkey").isNull) ||
        (col("g_key").isNotNull &&
          (col("g_key") =!= col("asof_orderkey") ||
           col("g_price") =!= col("asof_totalprice"))))
      .count()
    assert(diff === 0)
  }

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
